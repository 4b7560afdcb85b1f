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
}
