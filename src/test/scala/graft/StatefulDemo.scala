package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StatefulAggregate
import graft.streaming.StatefulAggregate.Ev

/** Manual drive for the stateful streaming aggregate:
  * `sbt "Test/runMain graft.StatefulDemo"` — prints per-batch memory
  * sink contents so state carry-over is observable outside ScalaTest. */
object StatefulDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StatefulAggregate.runningUserStats(mem.toDS())
      .writeStream.format("memory").queryName("demo_state")
      .outputMode("update").start()
    mem.addData(Ev(1L, 10.0), Ev(1L, 20.0), Ev(2L, 5.0))
    q.processAllAvailable()
    println("BATCH1=" + spark.table("demo_state").collect().toSeq.sortBy(_.getLong(0)))
    mem.addData(Ev(1L, 5.0))
    q.processAllAvailable()
    println("BATCH2=" + spark.table("demo_state").collect().toSeq.sortBy(_.getLong(0)))
    q.stop(); spark.stop()
  }
}
