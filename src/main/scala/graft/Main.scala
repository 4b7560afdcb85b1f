package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TimeFns
import graft.sources.{OddsJsonFlattener, PartitionedParquetStore}

/** Handler-equivalent dispatcher (SURVEY §3.1, reference main.py:25-40).
  *
  * The reference's Lambda handler takes {collectors_to_run, date?},
  * resolves the collection timestamp (explicit date localized to
  * US/Central, else now), and dispatches to collector objects. Here the
  * collectors are pipeline functions over a pluggable fetch shim (the
  * HTTP boundary is driver-side and injected so tests/offline runs pass
  * fixture payloads — SURVEY §2.1 S1/S2).
  */
object Main {

  /** The handler event (events/sample.json shape). */
  case class EventSpec(collectorsToRun: Seq[String], date: Option[String])

  /** Handler-equivalent CLI: `run <storeRoot> <collector,...> [date]`.
    * Offline mode: the odds collector runs on the embedded canonical
    * fixture payload (the HTTP boundary is injected in production). */
  def main(args: Array[String]): Unit = {
    val storeRoot = if (args.length > 0) args(0) else "/tmp/graft-store"
    val collectors = if (args.length > 1) args(1).split(",").toSeq else Seq("odds")
    val date = if (args.length > 2) Some(args(2)) else None

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ts = resolveTimestamp(date)
    collectors.foreach {
      case "odds" =>
        oddsCollector(s"$storeRoot/odds")(spark,
          Seq(graft.queries.ScalarQueries.oddsFixtureJson), ts)
        println(s"[main] odds collected -> $storeRoot/odds (ts=$ts)")
      case "rankings" =>
        // collector_map parity (reference main.py:19-22): the full
        // 221-spec registry drives the wide build; the fetch is the
        // offline fixture shim.
        import graft.sources.TeamRankingsNormalizer
        val tables = TeamRankingsNormalizer.registry.map(spec =>
          TeamRankingsNormalizer.normalizeTable(
            TeamRankingsNormalizer.offlineFixture(spark, spec), spec))
        val wide = TeamRankingsNormalizer.finalPass(
          graft.operators.WideStats.wideFromTables(tables, "team"))
        rankingsUpsert(spark, s"$storeRoot/rankings", wide, ts)
        println(s"[main] rankings collected -> $storeRoot/rankings " +
          s"(${wide.columns.length} cols, ts=$ts)")
      case other =>
        System.err.println(s"[main] unknown collector: $other (have: odds, rankings)")
    }
    spark.stop()
  }

  /** One collection pipeline: payloads in, upserted table out. */
  type Collector = (SparkSession, Seq[String], java.sql.Timestamp) => Unit

  /** Odds collection (§3.2): flatten fixture/API payloads, stamp the
    * collection timestamp, history-preserving upsert. */
  def oddsCollector(storeRoot: String): Collector =
    (spark, payloads, ts) => {
      import spark.implicits._
      val flat = OddsJsonFlattener.flatten(payloads.toDF("json"))
      val stamped = OddsJsonFlattener.withCollectionTimestamp(flat, lit(ts))
      new PartitionedParquetStore(spark, storeRoot)
        .upsertDistinct(stamped, "timestamp")
    }

  /** Team-rankings collection (§3.3): normalized payload frames are
    * stacked+pivoted upstream (WideStats); here the store step — keyed
    * keep-latest upsert on all non-timestamp columns. The collection
    * timestamp is stamped NOW, so the newest-batch fast path applies
    * (zero shuffle of stored data). */
  def rankingsUpsert(spark: SparkSession, storeRoot: String,
                     wide: DataFrame, ts: java.sql.Timestamp): Unit = {
    val stamped = wide.withColumn("timestamp", lit(ts))
    new PartitionedParquetStore(spark, storeRoot)
      .upsertNewestBatch(stamped, wide.columns.toSeq, "timestamp")
  }

  /** Resolve the collection instant: explicit date is interpreted as
    * US/Central wall-clock (main.py:31-32), else now. */
  def resolveTimestamp(date: Option[String]): java.sql.Timestamp =
    date match {
      case Some(d) =>
        val local = java.time.LocalDate.parse(d).atStartOfDay(
          java.time.ZoneId.of(TimeFns.CentralTz))
        java.sql.Timestamp.from(local.toInstant)
      case None => java.sql.Timestamp.from(java.time.Instant.now())
    }
}
