package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables at
  * "/root/testdata/sfN/name.parquet" — see TESTDATA.md / FIXTURES.md §5.
  * One parquet per table; Catalyst handles column pruning + predicate
  * pushdown on these scans, so callers just `.select`/`.filter`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS) in others, so the loader adapts
    * to whichever this dataset carries:
    *  - NANOS: Spark refuses to read it natively; read as long (legacy
    *    conf) and truncate ns → µs — exactly what DuckDB's TIMESTAMP
    *    (µs) view of the same file does, keeping the oracle comparable.
    *  - MICROS (isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ; cast
    *    to TIMESTAMP (sessions run UTC, so the µs value is unchanged)
    *    so downstream ops see the same type either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
