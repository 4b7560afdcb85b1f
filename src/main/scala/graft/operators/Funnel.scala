package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion-funnel analysis over an event log: for a step
  * sequence like signup → click → purchase, a user converts step k
  * iff an event of step k's type occurs STRICTLY AFTER their step-k−1
  * conversion instant (the classic ordered-funnel semantics — a
  * purchase before the signup doesn't count). Returns one audit row
  * per step: users reaching it, conversion vs the previous step, and
  * the mean hours taken from the previous step.
  *
  * Scale shape: the log is repartitioned by user ONCE; every step is
  * a user-keyed conditional-min aggregation joined user-to-user
  * against the previous step's frame, so all joins and aggs reuse the
  * same hash partitioning (subset clustering — no second corpus-wide
  * exchange). Per-step state is one timestamp per surviving user.
  * Time deltas aggregate as exact integer microsecond sums, so means
  * are order-independent across engines.
  */
object Funnel {

  /** One row per step: (step, step_name, n_users, conversion_from_prev,
    * mean_hours_from_prev); the first step's conversion/delta are null. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val log = events
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
              col(tsCol).as("__ts"))
      .repartition(col("__u"))

    // per-user conversion instants, built stepwise
    val first = log.filter(col("__t") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("t0"))
    val frames = steps.zipWithIndex.tail.foldLeft(Seq(first)) {
      case (acc, (step, i)) =>
        val prev = acc.last
        val next = log.filter(col("__t") === step)
          .join(prev.select(col("__u"), col(s"t${i - 1}")), Seq("__u"))
          .filter(col("__ts") > col(s"t${i - 1}"))
          .groupBy(col("__u"))
          .agg(min(col("__ts")).as(s"t$i"),
               // t_{i-1} is functionally dependent on the user — min
               // is just the deterministic way to carry it through
               min(col(s"t${i - 1}")).as(s"p$i"))
        acc :+ next
    }

    // fully declarative audits: previous-step counts join in as 1-row
    // frames rather than driver-side actions
    val audits = frames.zip(steps.zipWithIndex).map {
      case (frame, (name, 0)) =>
        frame.agg(count(lit(1)).as("n_users"))
          .select(lit(1).as("step"), lit(name).as("step_name"),
                  col("n_users"),
                  lit(null).cast("double").as("conversion_from_prev"),
                  lit(null).cast("double").as("mean_hours_from_prev"))
      case (frame, (name, i)) =>
        val prevCount = frames(i - 1).agg(count(lit(1)).as("__pn"))
        frame
          .agg(count(lit(1)).as("n_users"),
               sum((unix_micros(col(s"t$i")) - unix_micros(col(s"p$i")))
                     .cast("decimal(38,0)")).as("__sum_us"))
          .crossJoin(prevCount)
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
                  col("n_users"),
                  round(col("n_users").cast("double")
                          / col("__pn").cast("double"), 4)
                    .as("conversion_from_prev"),
                  round(col("__sum_us").cast("double")
                          / col("n_users").cast("double") / lit(3.6e9), 4)
                    .as("mean_hours_from_prev"))
    }
    audits.reduce(_ unionByName _)
  }
}
