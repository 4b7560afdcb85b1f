package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** Count-min sketch: the over-count invariant, exactness when the
  * sketch is collision-free, and the cell-wise merge contract. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def keys = (1L to 3000L).map(i => i % 97 * (i % 89)).toDF("k")

  test("estimates never undercount; exact when width dwarfs key count") {
    val exact = keys.groupBy($"k").agg(count(lit(1)).as("n"))
    val sk = Sketch.cmsBuild(keys, "k", depth = 4, width = 128)
    val est = Sketch.cmsEstimate(sk, keys, "k", depth = 4, width = 128)
    val joined = exact.join(est, "k")
      .select($"k", $"n", $"cms_est").collect()
    assert(joined.forall(r => r.getLong(2) >= r.getLong(1)),
      "CMS must never undercount")
    // wide sketch: collisions vanish, estimates are exact
    val wide = Sketch.cmsEstimate(
      Sketch.cmsBuild(keys, "k", depth = 4, width = 65536),
      keys, "k", depth = 4, width = 65536)
    val exactJoin = exact.join(wide, "k")
      .filter($"cms_est" =!= $"n").count()
    assert(exactJoin === 0L, "wide sketch should be collision-free here")
  }

  test("merge of split-half sketches == sketch of the whole") {
    val a = keys.filter($"k" % 2 === 0)
    val b = keys.filter($"k" % 2 =!= 0)
    val merged = Sketch.cmsMerge(
      Sketch.cmsBuild(a, "k", 4, 128), Sketch.cmsBuild(b, "k", 4, 128))
    val whole = Sketch.cmsBuild(keys, "k", 4, 128)
    assert(merged.exceptAll(whole).count() === 0L)
    assert(whole.exceptAll(merged).count() === 0L)
    // sketch size is bounded by d*w regardless of input size
    assert(whole.count() <= 4L * 128L)
  }
}
