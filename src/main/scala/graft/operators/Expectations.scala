package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the audit layer a pipeline
  * runs before publishing a table (the dbt-test / Great-Expectations
  * role, engine-native). Each rule reduces to ONE boolean-per-row
  * expression counted in a shared aggregation pass, so checking ten
  * rules costs the same single scan + tiny exchange as checking one;
  * referential integrity adds one more aggregation on the
  * foreign-key side. Output is one row per rule:
  * (rule, n_rows, n_violations, pass).
  *
  * At 100 TB: the per-row predicates fold into whole-stage codegen on
  * the scan; partial counts combine map-side to #rules values per
  * partition. The FK check never joins row-by-row — it aggregates the
  * child side to DISTINCT keys first (vocabulary-sized), then
  * anti-joins that against the parent keys, so the exchange carries
  * key cardinality, not table cardinality.
  */
object Expectations {

  /** A named per-row expectation: `predicate` must hold on every row. */
  final case class Rule(name: String, predicate: Column)

  def notNull(c: String): Rule = Rule(s"not_null_$c", col(c).isNotNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).isNull || (col(c) >= lo && col(c) <= hi))

  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"in_set_$c", col(c).isNull || col(c).isin(allowed: _*))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches_$c", col(c).isNull || col(c).rlike(regex))

  /** Evaluate all per-row rules in one aggregation pass. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.flatMap { r =>
      Seq(sum(when(!coalesce(r.predicate, lit(false)), 1L).otherwise(0L))
            .as(s"__v_${r.name}"))
    }
    val counted = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // stack to long form: one row per rule
    val stackArgs = rules.map(r =>
      s"'${r.name}', `__v_${r.name}`").mkString(", ")
    counted.selectExpr("__n",
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)")
      .select(col("rule"), col("__n").as("n_rows"), col("n_violations"),
              (col("n_violations") === 0L).as("pass"))
  }

  /** Uniqueness of a key combination: n_violations = rows beyond the
    * first per duplicated key. One aggregation on the key. */
  def unique(df: DataFrame, keys: Seq[String], name: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(exprSum(col("__c")).as("n_rows"),
           exprSum(col("__c") - 1L).as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"),
              (col("n_violations") === 0L).as("pass"))

  /** Referential integrity: every non-null `childKey` value exists in
    * `parent`'s `parentKey`. Child reduces to DISTINCT keys (with
    * occurrence counts) BEFORE the anti-join, so the join moves key
    * cardinality; violations count child ROWS with orphaned keys. */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   name: String): DataFrame = {
    val childKeys = child.filter(col(childKey).isNotNull)
      .groupBy(col(childKey).as("__k")).agg(count(lit(1)).as("__c"))
    val parentKeys = parent.select(col(parentKey).as("__k")).distinct()
    val orphans = childKeys.join(parentKeys, Seq("__k"), "left_anti")
    val totals = child.agg(count(lit(1)).as("n_rows"))
    totals.crossJoin(
        orphans.agg(coalesce(exprSum(col("__c")), lit(0L)).as("n_violations")))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"),
              (col("n_violations") === 0L).as("pass"))
  }

  /** Union the audit rows of several checks into one report. */
  def report(first: DataFrame, rest: DataFrame*): DataFrame =
    rest.foldLeft(first)(_ unionByName _)

  private def exprSum(c: Column): Column = sum(c).cast("long")
}
