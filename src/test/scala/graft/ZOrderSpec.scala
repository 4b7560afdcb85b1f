package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton z-value interleaves bits exactly") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (4095L, 4095L))
      .toDF("x", "y")
    val got = df.select(ZOrder.zValue($"x", $"y", 12).as("z"))
      .as[Long].collect().toSeq
    def ref(x: Long, y: Long): Long =
      (0 until 12).map(b => (((x >> b) & 1L) << (2 * b)) |
                            (((y >> b) & 1L) << (2 * b + 1))).reduce(_ | _)
    assert(got === Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (4095L, 4095L))
      .map((ref _).tupled))
    assert(ref(3L, 5L) === 39L) // hand-checked: x bits→0,2; y bits→1,5
  }

  test("aligned z-ranges cover narrow (x, y) rectangles — the pruning property") {
    // Full 32x32 grid, 5-bit z. Any aligned block of 128 consecutive
    // z-values frees x bits 0..3 and y bits 0..2, so a file covering
    // one block spans at most 16 x-values and 8 y-values — that
    // narrowness is exactly what makes min-max stats prune on either
    // dimension after a z-order layout.
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y")
    val stats = grid
      .select($"x", $"y", ZOrder.zValue($"x", $"y", 5).as("z"))
      .groupBy((col("z") / 128).cast("long").as("blk"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"),
           count(lit(1)).as("n"))
      .collect()
    assert(stats.length === 8 && stats.forall(_.getLong(3) === 128L))
    assert(stats.forall(r => r.getLong(1) <= 15L && r.getLong(2) <= 7L))
  }
}
