package graft

/** Handler-event parity (reference main.py:25-40): the dispatcher
  * accepts the `{"collectors_to_run": [...], "date": ...}` event shape
  * with reference collector_map names, resolves explicit dates as
  * US/Central wall-clock, and skips ineligible names. The odds
  * collection runs end-to-end from an event; the rankings wide build
  * has its own end-to-end coverage in RegistrySpec (it is the same
  * chain runEvent calls).
  */
class MainSpec extends SparkSpec {

  test("parseEvent reads the reference sample event shape") {
    val ev = Main.parseEvent(
      """{"collectors_to_run": ["odds_data_collector",
        |"team_rankings_data_collector"], "date": "2024-11-18"}""".stripMargin)
    assert(ev.collectorsToRun ===
      Seq("odds_data_collector", "team_rankings_data_collector"))
    assert(ev.date === Some("2024-11-18"))
    // both reference names dispatch, through the collector_map aliases
    assert(Main.collectorsOf(ev) === Seq("odds", "rankings"))
  }

  test("parseEvent: missing date -> now-semantics; unknown collectors skipped") {
    val ev = Main.parseEvent("""{"collectors_to_run": ["odds", "nope"]}""")
    assert(ev.date === None)
    assert(Main.collectorsOf(ev) === Seq("odds"))
  }

  test("explicit date resolves as US/Central wall-clock midnight") {
    val ts = Main.resolveTimestamp(Some("2024-11-18"))
    // 2024-11-18 00:00 CST (UTC-6, post-DST) == 06:00 UTC
    assert(ts.toInstant === java.time.Instant.parse("2024-11-18T06:00:00Z"))
    val summer = Main.resolveTimestamp(Some("2024-07-01"))
    // CDT (UTC-5) in July
    assert(summer.toInstant === java.time.Instant.parse("2024-07-01T05:00:00Z"))
  }

  test("odds collection dispatches end-to-end from an event file") {
    val store = tmpDir("mainspec-store")
    val eventFile = java.nio.file.Files.createTempFile("event", ".json")
    java.nio.file.Files.writeString(eventFile,
      """{"collectors_to_run": ["odds_data_collector"], "date": "2024-11-18"}""")
    val ev = Main.parseEvent(java.nio.file.Files.readString(eventFile))
    Main.runEvent(spark, store, ev)
    val out = spark.read.parquet(s"$store/odds")
    assert(out.count() === 6) // the canonical fixture's six outcome rows
    import org.apache.spark.sql.functions.col
    val ts = out.select(col("timestamp")).distinct().collect()
    assert(ts.length === 1 &&
      ts.head.getTimestamp(0).toInstant ===
        java.time.Instant.parse("2024-11-18T06:00:00Z"))
  }
}
