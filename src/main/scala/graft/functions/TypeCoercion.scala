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

    val countsRow = df.agg(
      count(numericCand(strCols.head)).as(strCols.head),
      strCols.tail.map(c => count(numericCand(c)).as(c)).toIndexedSeq: _*).head()
    val parseCount = strCols.zipWithIndex.map { case (c, i) => c -> countsRow.getLong(i) }.toMap

    val out = df.schema.fields.map { f =>
      if (f.dataType != StringType) col(f.name)
      else if (parseCount(f.name) > 0) numericCand(f.name).as(f.name)
      else Cleaning.nullOutMarkers(Cleaning.emptyToNull(col(f.name))).as(f.name)
    }
    df.select(out.toIndexedSeq: _*)
  }
}
