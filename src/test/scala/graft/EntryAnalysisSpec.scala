package graft

/** Schema-drift tripwire: ANALYZE every registered query against the
  * real driver testdata. Round 4 lost 21 queries silently when the
  * generated `events.parquet` switched TIMESTAMP(NANOS) → MICROS:
  * unit specs stayed green (they synthesize their own frames) while
  * every events-consuming query failed analysis in Verify/Bench.
  * Resolving each plan against the actual parquet schemas (no
  * execution — `df.schema` forces analysis only, so the whole sweep
  * is seconds) makes `sbt test` fail the moment the testdata and the
  * loaders disagree again.
  */
class EntryAnalysisSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry query analyzes against the driver testdata") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"driver testdata not present at $sfDir")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.size} queries fail analysis:\n" +
      failures.mkString("\n"))
  }

  test("every query has oracle SQL or is a declared rows-only check") {
    // every oracleSql key must have a matching query; orphan SQL is a typo
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }
}
