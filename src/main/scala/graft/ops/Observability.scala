package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass data-quality metrics via `Dataset.observe`.
  *
  * The reference audits its frames with separate passes (E2's
  * `df.isnull().sum()`, A8/A9 count prints — Hap880_Final_Project.py:31,
  * 267-269); the engine's `SchemaOps.nullCounts` is the one-pass batch
  * form of that. This is the PIPELINE form: metrics are computed as
  * accumulators DURING whatever job first consumes the returned
  * DataFrame — at 100 TB the difference between auditing for free and
  * paying a second full scan.
  */
object Observability {

  /** Attach (n_rows, n_null_<col>…) observation to `df`. Read
    * `observation.get` AFTER an action has consumed the returned frame.
    */
  def observeQuality(df: DataFrame, cols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation()
    val metrics: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        // count, not sum: sum over ZERO rows is null, and an empty observed
        // frame should report 0 nulls, not a null metric
        cols.map(c => count(when(col(c).isNull, 1)).as(s"n_null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
