package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.functions.{Cleaning, TypeCoercion}

/** The pathological-types fixture (FIXTURES.md §2, from the reference's
  * test_s3_data_type_handling.py:150-157). */
class TypeCoercionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val frame = Seq(
    ("Team A", "1",   "",      "1.0",  "--",  "50%",   "12"),
    ("Team B", "2",   "value", "None", "++",  "",      "7"),
    ("Team C", "3.0", "",      "3.0",  "10",  "75.5%", "3")
  ).toDF("team", "mixed_type", "empty_strings", "none_values",
         "special_chars", "offense_scoring_ep_pcnt_last3", "games")

  test("coercion ladder adopts numeric only when something parses (F11)") {
    val out = TypeCoercion.normalizeTypes(frame)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("team") === StringType)
    assert(types("mixed_type") === DoubleType)       // "3.0" blocks int64
    assert(types("empty_strings") === StringType)    // nothing parses
    assert(types("none_values") === DoubleType)      // 1.0/3.0 parse
    assert(types("special_chars") === DoubleType)    // "10" parses, NaNs force double
    assert(types("games") === org.apache.spark.sql.types.LongType) // every row int
    val rows = out.orderBy("team").collect()
    assert(rows.map(_.getAs[Any]("mixed_type")).toSeq === Seq(1.0, 2.0, 3.0))
    assert(Option(rows(1).getAs[Any]("none_values")).isEmpty) // 'None' → null
    assert(Option(rows(0).getAs[Any]("empty_strings")).isEmpty) // '' → null
  }

  test("'NaN' marker strings do NOT trigger numeric adoption (pandas parity)") {
    // pandas: to_numeric('NaN') -> NaN, which doesn't count as converted
    // (notna().sum()==0) -> column stays object/string. A try_cast-based
    // decide pass would wrongly adopt double here.
    val df = Seq(("a", "NaN"), ("b", "nan")).toDF("k", "marker")
    val out = TypeCoercion.normalizeTypes(df)
    assert(out.schema("marker").dataType === StringType)
    assert(out.select("marker").collect().forall(_.isNullAt(0))) // markers nulled
  }

  test("production repro: scrub + percent-parse upstream, then ladder " +
       "(test_s3_data_type_handling.py:128-146)") {
    // reference order: scrub symbols (F8) → percent parse (F9) → ladder
    val scrubbed = Cleaning.mapStringCols(frame,
      c => Cleaning.percentParse(Cleaning.scrubSymbols(c)))
    val out = TypeCoercion.normalizeTypes(scrubbed)
    val pct = out.orderBy("team")
      .select("offense_scoring_ep_pcnt_last3").collect().map(r => Option(r.get(0)))
    assert(pct.toSeq === Seq(Some(0.5), None, Some(0.755)))
  }

  test("round-trips parquet without error (the reference's write gate)") {
    val dir = tmpDir("coerce")
    TypeCoercion.normalizeTypes(frame).write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).count() === 3)
  }
}
