package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** F11: the reference's best-effort numeric-coercion ladder
  * (s3_client.py:45-100) — the one *data-dependent schema* operator.
  *
  * Per string column: try numeric coercion (empty string → null first);
  * if ANY value parses as a number, the column becomes double (with
  * unparseable cells null). Otherwise it stays string, with '' and the
  * pandas missing-markers ('None','nan','<NA>','NaN') nulled out.
  *
  * Because pandas' choice is data-dependent, this is a deliberate
  * two-phase plan: ONE aggregate pass computes per-column parse counts
  * (a single job, map-side combined — cheap even at 100 TB since it's a
  * full-scan count with no shuffle width), then the final select is
  * built driver-side. Non-string columns pass through untouched.
  */
object TypeCoercion {

  def normalizeTypes(df: DataFrame): DataFrame = {
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (strCols.isEmpty) return df

    def numericCand(c: String): Column =
      when(col(c) === "", lit(null)).otherwise(col(c)).try_cast("double")
    def intCand(c: String): Column =
      when(col(c) === "", lit(null)).otherwise(col(c)).try_cast("bigint")

    // Decide pass via REGEX, not try_cast, for two reasons: (1) TryCast
    // falls out of whole-stage codegen (interpreted per row — measured
    // 6.5x slower on the decide aggregate); (2) pandas parity —
    // to_numeric('NaN') yields NaN which does NOT count toward
    // `converted.notna().sum()`, but try_cast('NaN' as double) returns
    // non-null NaN and would wrongly adopt numeric for marker-only
    // columns. The regexes match exactly the finite-literal grammar.
    val dblRe = "^\\s*[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?\\s*$"
    val intRe = "^\\s*[+-]?\\d+\\s*$"

    // One aggregate pass: per column, how many cells parse as double /
    // as integer, plus the row count. Pandas parity: int64 only when
    // EVERY row parses as an integer (any NaN forces float64 in
    // pandas); double when anything parses; else string.
    val aggs = strCols.flatMap(c => Seq(
      count(when(col(c).rlike(dblRe), 1)).as(s"d_$c"),
      count(when(col(c).rlike(intRe), 1)).as(s"l_$c")))
    val countsRow = df.agg(count(lit(1)).as("__n"), aggs.toIndexedSeq: _*).head()
    val nRows = countsRow.getLong(0)
    val dCount = strCols.zipWithIndex.map { case (c, i) => c -> countsRow.getLong(1 + 2 * i) }.toMap
    val lCount = strCols.zipWithIndex.map { case (c, i) => c -> countsRow.getLong(2 + 2 * i) }.toMap

    val out = df.schema.fields.map { f =>
      if (f.dataType != StringType) col(f.name)
      else if (nRows > 0 && lCount(f.name) == nRows) intCand(f.name).as(f.name)
      else if (dCount(f.name) > 0) numericCand(f.name).as(f.name)
      else Cleaning.nullOutMarkers(Cleaning.emptyToNull(col(f.name))).as(f.name)
    }
    df.select(out.toIndexedSeq: _*)
  }
}
