package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Cleaning
import graft.operators.Dedup

/** Property-based invariants (SURVEY §5): upsert idempotence, dedup
  * keep-latest, percent round-trip, union commutativity. Drives
  * ScalaCheck generators directly with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache) — 5 samples
  * per property, deterministic across runs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String, Int)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0L, 5L)
      v <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0, 10)
    } yield (k, v, t))

  private def samples[T](g: Gen[T], n: Int = 5): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: distinctUnion idempotence — merge(x, x) ≡ distinct(x)") {
    samples(rowsGen).foreach { rows =>
      val df = rows.toDF("k", "v", "t")
      val once = Dedup.distinctUnion(df, df)
      assert(once.count() === df.distinct().count())
      assert(Dedup.distinctUnion(once, df).count() === once.count())
    }
  }

  test("property: keepLatest keeps exactly one row per key, the max under ordering") {
    samples(rowsGen).foreach { rows =>
      val df = rows.toDF("k", "v", "t")
      val out = Dedup.keepLatest(df, Seq("k"), Seq($"t".desc, $"v".desc))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      val expected = rows.groupBy(_._1).view.mapValues(
        _.maxBy(r => (r._3, r._2))).values.toSet
      assert(out.toSet === expected)
    }
  }

  test("property: union-dedup is batch-order independent") {
    samples(Gen.zip(rowsGen, rowsGen)).foreach { case (a, b) =>
      val da = a.toDF("k", "v", "t"); val db = b.toDF("k", "v", "t")
      assert(Dedup.distinctUnion(da, db).count() ===
             Dedup.distinctUnion(db, da).count())
    }
  }

  test("property: percent format ∘ parse round-trips 2-decimal fractions") {
    samples(Gen.listOfN(20, Gen.choose(0, 10000))).foreach { basisPoints =>
      val pcts = basisPoints.map(bp => f"${bp / 100.0}%.2f%%") // e.g. "75.50%"
      val parsed = pcts.toDF("v")
        .select(Cleaning.percentToDouble($"v").as("p")).as[Double].collect()
      parsed.lazyZip(basisPoints).foreach { (p, bp) =>
        assert(math.abs(p - bp / 10000.0) < 1e-12)
      }
    }
  }

  test("property: window merge and small-batch fast path agree when the batch is newest") {
    // (k, v, t) with duplicate keys; total order = (t, v) all-desc.
    samples(Gen.zip(rowsGen, rowsGen)).foreach { case (a, b) =>
      val existing = a.toDF("k", "v", "t")
      // updates: one row per key (mergeSmallUpdates contract), newest t
      val updates = b.groupBy(_._1).map { case (k, rs) =>
        val (_, v, _) = rs.maxBy(r => (r._3, r._2)); (k, v, 99)
      }.toSeq.toDF("k", "v", "t")
      val order = Seq($"t".desc, $"v".desc)
      val w = Dedup.merge(existing, updates, Seq("k"), order)
        .collect().map(_.toSeq).toSet
      val fast = Dedup.mergeSmallUpdates(existing, updates, Seq("k"))
      // fast path keeps ALL existing rows for untouched keys; reduce
      // them with keepLatest to compare per-key winners
      val fastWinners = Dedup.keepLatest(fast, Seq("k"), order)
        .collect().map(_.toSeq).toSet
      assert(fastWinners === w)
    }
  }

  private val textGen: Gen[List[(Long, String)]] =
    Gen.listOfN(20, for {
      id <- Gen.choose(0L, 1000000L)
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "eee"))
    } yield (id, ws.mkString(" ")))

  test("property: repetition metrics are fractions in [0,1]; top-token >= 1/n") {
    import graft.llm.TextStats
    samples(textGen).foreach { rows =>
      val out = rows.toDF("id", "text")
        .select(TextStats.tokens($"text").as("ws"))
        .select(TextStats.duplicateFractionOfGrams(
                  TextStats.ngramsOfTokens($"ws", 2)).as("d2"),
                TextStats.topTokenFractionOfTokens($"ws").as("top"),
                size($"ws").as("n"))
        .collect()
      out.foreach { r =>
        val (d2, top, n) = (r.getDouble(0), r.getDouble(1), r.getInt(2))
        assert(d2 >= 0.0 && d2 <= 1.0)
        assert(top >= 1.0 / n && top <= 1.0)
      }
    }
  }

  test("property: importance-sampled sets nest under pointwise score increases") {
    import graft.llm.Sampling
    samples(textGen).foreach { rows =>
      val df = rows.toDF("id", "text")
        .withColumn("score", (col("id") % 100).cast("double") / 100.0)
      def kept(s: org.apache.spark.sql.Column) =
        df.filter(Sampling.importanceKeep(col("id"), s))
          .select("id").collect().map(_.getLong(0)).toSet
      val low = kept(col("score"))
      val high = kept(least(col("score") + 0.3, lit(1.0)))
      assert(low.subsetOf(high))
    }
  }
}
