package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth beyond the primary snappy-parquet store:
  * ORC, JSON-lines with an explicit schema (schema inference on a
  * 100 TB lake is a full extra pass — never infer at scale), and
  * zstd-compressed parquet (the usual cold-tier codec choice). Each
  * format round-trips the same frame byte-for-value. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "alpha", 1.5, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
    (2L, "beta", -2.25, java.sql.Timestamp.valueOf("2024-02-03 04:05:06")),
    (3L, null.asInstanceOf[String], 0.0,
     java.sql.Timestamp.valueOf("2024-12-31 23:59:59"))
  ).toDF("id", "name", "score", "ts")

  // file formats read back fully nullable; the round-trip contract is
  // names + types + values, not the in-memory non-null flags
  private def shape(df: org.apache.spark.sql.DataFrame) =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
                           r.getDouble(2), r.getTimestamp(3))).toSet

  test("ORC round-trip preserves schema and values") {
    val dir = tmpDir("fmt-orc")
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(shape(back) === shape(sample))
    assert(asSet(back) === asSet(sample))
  }

  test("JSON-lines round-trip with an EXPLICIT schema (no inference pass)") {
    val dir = tmpDir("fmt-json")
    sample.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("ts", TimestampType)))
    val back = spark.read.schema(schema).json(dir)
      .select("id", "name", "score", "ts")
    assert(asSet(back) === asSet(sample))
  }

  test("zstd parquet round-trip") {
    val dir = tmpDir("fmt-zstd")
    sample.write.mode("overwrite")
      .option("compression", "zstd").parquet(dir)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.contains(".zstd.")))
    val back = spark.read.parquet(dir)
    assert(shape(back) === shape(sample))
    assert(asSet(back) === asSet(sample))
  }
}
