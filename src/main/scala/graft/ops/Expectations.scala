package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the admission gate a 100 TB
  * ingestion runs before data reaches training: range checks, null-rate,
  * key uniqueness, referential integrity. Each check reports
  * `(rule, n_violations, n_checked)` so the pipeline can enforce
  * "fail the batch if any violation" or "quarantine if rate > ε"
  * downstream (composes with the corrupt-record quarantine in the
  * ingestion layer).
  *
  * The reference validates implicitly (dropna/astype scattered through
  * Hap880_Final_Project.py:244-types,258-filters); here validation is an
  * explicit, reportable operator.
  */
object Expectations {

  /** Row-predicate rules, all evaluated in ONE aggregation pass: each rule
    * is a violation predicate (true = row violates). Output: one row per
    * rule. k rules cost one scan, not k jobs — the unpivot rides a 1-row
    * aggregate exactly like [[StatsOps.corrPairs]].
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.map { case (name, viol) =>
      sum(when(viol, 1L).otherwise(0L)).as(s"v_$name")
    }
    val agg = df.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"v_$name").as("n_violations"),
        col("n").as("n_checked"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_violations").as("n_violations"),
        col("r.n_checked").as("n_checked"))
  }

  /** Uniqueness expectation over a key column set: violations = rows
    * beyond the first of each duplicate group (`n − distinct`). One
    * two-phase distinct aggregate; no self-join.
    */
  def checkUnique(df: DataFrame, cols: Seq[String], name: String): DataFrame = {
    require(cols.nonEmpty, "need at least one key column")
    df.agg(
        count(lit(1)).as("n"),
        countDistinct(col(cols.head), cols.tail.map(col): _*).as("d"))
      .select(lit(name).as("rule"), (col("n") - col("d")).as("n_violations"),
        col("n").as("n_checked"))
  }

  /** Referential-integrity expectation: child rows whose key has no match
    * in the parent. Plans as a left-anti join — broadcast when the parent
    * is dimension-sized, shuffle-hash otherwise; either way the count is
    * the only thing materialized.
    */
  def checkFk(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String, name: String): DataFrame = {
    // left join against the DISTINCT parent keys + one aggregate: orphan
    // count and total in a single pass over the child (an anti-join plus
    // a separate total would scan the child twice)
    val p = parent.select(col(parentKey).as("_fk_pk")).distinct()
    child.select(col(childKey))
      .join(p, col(childKey) === col("_fk_pk"), "left")
      .agg(
        count(lit(1)).as("n_checked"),
        sum(when(col("_fk_pk").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))
  }
}
