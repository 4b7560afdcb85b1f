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

  /** The handler event (events/sample.json shape,
    * `{"collectors_to_run": [...], "date": "YYYY-MM-DD"}`). */
  case class EventSpec(collectorsToRun: Seq[String], date: Option[String])

  /** Reference collector_map keys (main.py:19-22) → local collector
    * names; the short local names are accepted too. */
  private val collectorAliases = Map(
    "odds_data_collector" -> "odds",
    "team_rankings_data_collector" -> "rankings")

  /** Parse the handler event JSON (Jackson — ships with Spark; the
    * event is a tiny driver-side payload, not data-plane work). Missing
    * `collectors_to_run` → empty; missing/null `date` → None. */
  def parseEvent(json: String): EventSpec = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val collectors = Option(root.get("collectors_to_run")).toSeq.flatMap { arr =>
      (0 until arr.size).map(arr.get(_).asText)
    }
    val date = Option(root.get("date")).filterNot(_.isNull).map(_.asText)
    EventSpec(collectors, date)
  }

  /** Normalized, eligible collector names of an event — reference
    * handler parity: aliases map through collector_map, names outside
    * it are skipped (main.py:37-40). */
  def collectorsOf(event: EventSpec): Seq[String] =
    event.collectorsToRun
      .map(c => collectorAliases.getOrElse(c, c))
      .filter(c => c == "odds" || c == "rankings")

  /** Handler-equivalent dispatch: resolve the collection timestamp
    * (explicit date → US/Central wall-clock, else now) and run each
    * eligible collector against `storeRoot`. Offline mode: the odds
    * collector runs on the embedded canonical fixture payload; the
    * rankings collector on the registry fixture shim (the HTTP
    * boundary is injected in production). */
  def runEvent(spark: SparkSession, storeRoot: String, event: EventSpec): Unit = {
    val ts = resolveTimestamp(event.date)
    val requested = collectorsOf(event)
    event.collectorsToRun.filterNot(c =>
        requested.contains(collectorAliases.getOrElse(c, c)))
      .foreach(other => System.err.println(
        s"[main] skipping ineligible collector: $other (have: odds, rankings)"))
    requested.foreach {
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
    }
  }

  /** Handler-equivalent CLI:
    * `run <storeRoot> <event.json | {inline json} | collector,...> [date]`.
    * The second arg is the reference's handler event — a path to an
    * event JSON file or the JSON itself — with comma-separated
    * collector names (plus optional date arg) kept as a CLI fallback. */
  def main(args: Array[String]): Unit = {
    val storeRoot = if (args.length > 0) args(0) else "/tmp/graft-store"
    val event =
      if (args.length > 1 && args(1).trim.startsWith("{"))
        parseEvent(args(1))
      else if (args.length > 1 && args(1).endsWith(".json"))
        parseEvent(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args(1))), "UTF-8"))
      else EventSpec(
        if (args.length > 1) args(1).split(",").toSeq else Seq("odds"),
        if (args.length > 2) Some(args(2)) else None)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    runEvent(spark, storeRoot, event)
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
