package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is run once untimed (plan + codegen + JIT warmup — cost
  * that amortizes away in any long-lived engine) and then timed. The
  * reported number is the warm run; `warmup_sec` reports the total
  * first-run cost separately so cold-start is still visible.
  *
  * Evaluation is forced with the `noop` datasource writer, not
  * `count()`: a count lets Catalyst prune every column the count
  * doesn't need, so projection-heavy queries (regex redaction, chunk
  * concat, quantization) would report optimistic fiction. The noop
  * sink materializes every output column of every row and discards
  * them — full work, zero I/O. A throwing query aborts the bench
  * (exit != 0) rather than being silently reported as a fast success.
  *
  * Per-query JVM GC time (delta over the reported run, from the
  * collector MXBeans) is emitted as `gc_sec`: an environment-induced
  * outlier — a heap-pressure collapse under the forked -Xmx — shows
  * up as gc_sec ≈ its wall time and is self-diagnosing rather than
  * masquerading as a plan regression.
  *
  * The session runs with `graft.plans.GraftExtensions` installed, so
  * FuseCosineRule is exercised by every bench run as it would be in a
  * production session (the HOF-cosine queries get the fused native
  * expression through the RULE, not hand-rewritten plans).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // The bench contract is local[32] (the driver machine's thread
    // budget); SPARK_GRAFT_CPUS only narrows it for local iteration.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String)(run: => Unit): Unit =
      try run catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE in $name: $e")
          spark.stop()
          throw e
      }

    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    // Local-iteration aid: SPARK_GRAFT_ONLY=q70_corpus_build,q60_...
    // times just those queries. The driver never sets it, so the
    // official per-round bench always covers the full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    var warmupTotal = 0.0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val w0 = System.nanoTime()
      force(name)(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
      warmupTotal += (System.nanoTime() - w0) / 1e9
      // Full evaluation allocates heavily; without this an eventual
      // full-GC pause (~15 s on this heap) lands inside whichever
      // query happens to be running and poisons its number. Pay the
      // GC in the untimed gap and report the min of two timed runs
      // (with the GC time that run actually paid). EVERY query gets
      // the same attempt count — selectively over-sampling contested
      // queries would bias their minima against the rest of the suite
      // (transient-interference adjudication lives in the round
      // notes, not in the harness; the r9 q28 incident is documented
      // in VERDICT r10).
      val timed = (1 to 2).map { _ =>
        System.gc()
        val g0 = gcMillis
        val t0 = System.nanoTime()
        force(name)(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
        ((System.nanoTime() - t0) / 1e9, (gcMillis - g0) / 1e3)
      }
      name -> timed.minBy(_._1)
    }
    // A typo'd SPARK_GRAFT_ONLY must not report an (impossibly fast)
    // empty bench as success.
    require(results.nonEmpty,
      s"no queries matched SPARK_GRAFT_ONLY=${only.map(_.mkString(","))}")

    // The whiplash audit set (r9/r12/r13: one contended sample of
    // these headlined three separate rounds): take ONE extra timed
    // sample each, reported SEPARATELY in notes.audit_min3 — the
    // headline per-query map stays uniform min-of-2 (the r11 ask:
    // selective over-sampling would bias contested minima against
    // the rest of the suite), while round-over-round comparison reads
    // the min-of-3 so a single transient can't headline again.
    val auditSet = Set("q28_minhash_pairs", "q202_cv_ols",
      "q209_levene", "q203_perm_test")
    val auditMin3: Seq[(String, Double)] = results
      .filter { case (name, _) => auditSet.contains(name) }
      .map { case (name, (best2, _)) =>
        val fn = SparkEntry.queries(name)
        System.gc()
        val t0 = System.nanoTime()
        force(name)(fn(spark, sfDir).write.mode("overwrite")
          .format("noop").save())
        name -> math.min(best2, (System.nanoTime() - t0) / 1e9)
      }
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, (t, _)) => k -> t })
    val gcs = jmap(results.map { case (k, (_, g)) => k -> g })
    val total = results.map(_._2._1).sum
    val gcTotal = results.map(_._2._2).sum
    // `cpus` rides along so runs at different local[N] settings can't
    // be compared unknowingly (the r2→r3 local[4] lesson). Static
    // per-query measurement caveats ride in `notes` so timing
    // semantics survive in the artifact, not just a source comment.
    // run_label: the close-artifact convention is to snapshot from an
    // OTHERWISE-IDLE machine; a refresh taken while other jobs run is
    // labeled so round-over-round comparisons know which was which.
    // sanitized: the label lands inside a JSON string literal, and a
    // quote/backslash in the env var must not corrupt the artifact
    // default "refresh": driver-initiated runs (which never set the
    // env var) are exactly the possibly-contended refresh runs the
    // label discipline exists to distinguish; "idle" is only ever
    // claimed EXPLICITLY by a builder snapshotting an idle machine
    val runLabel = sys.env.getOrElse("SPARK_GRAFT_RUN_LABEL", "refresh")
      .replaceAll("[^A-Za-z0-9 ._-]", "_")
    val notes = s"""{"q241_bucketed_merge":"timed portion = final read-back of the merged store; the 4-batch merge chain + mid-chain 16->24 rescale run at DataFrame construction and land in warmup_sec","run_label":"$runLabel","audit_min3":${jmap(auditMin3)}}"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"gc_sec":$gcs,"gc_total_sec":$gcTotal,"warmup_sec":$warmupTotal,"cpus":$cpus,"sf":"$sfDir","notes":$notes}"""
    println(full)
    // The full line is ~2.5 KB and the driver keeps only a ~2 KB tail
    // of stdout, so it can never parse the per-query map from the
    // stream. Persist the complete JSON as a committed artifact
    // (round-over-round per-query diffs live in git history), and end
    // stdout with a COMPACT line — same "total" metric contract, only
    // the ten slowest queries inline — that fits the tail whole.
    // (build.sbt routes forked stdout through raw, so this line is
    // not "[info] "-prefixed and a line-oriented JSON parse works.)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"BENCH_LOCAL.json write failed: $e") }
    val top10 = jmap(results.sortBy(-_._2._1).take(10)
      .map { case (k, (t, _)) => k -> t })
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"gc_total_sec":$gcTotal,"warmup_sec":$warmupTotal,"cpus":$cpus,"sf":"$sfDir","slowest":$top10,"queries_file":"BENCH_LOCAL.json"}""")
    spark.stop()
  }
}
