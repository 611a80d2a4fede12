package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join: for each left row, attach the payload
  * of the right row with the GREATEST right time ≤ the left row's time,
  * within the same key (the "state of the account when the event
  * happened" join — enrichment against slowly-changing reference data,
  * feature snapshots, latest-order-before-event).
  *
  * Spark has no asof operator; the naive encodings are a range
  * θ-join (per-row interval probe → nested-loop explosion) or a
  * window over a crossJoin (O(|L|·|R|) rows). This is the scalable
  * form: tag both inputs, union them, and run ONE window pass —
  *
  *   1. right rows become (key, time, payload, side=1); left rows
  *      (key, time, leftCols, side=0); union carries |L|+|R| rows;
  *   2. one hash partitioning on the key, ordered by (time, side DESC)
  *      so a right row at time T sorts before a left row at the same T
  *      (the "at or before" tie is inclusive);
  *   3. `last(payload) IGNORE NULLS` over rows-unbounded-preceding
  *      carries the most recent right payload forward onto each left row.
  *
  * One shuffle of |L|+|R| rows, codegen'd window, no row explosion —
  * survives 100 TB where any probe-per-row form dies.
  *
  * Contract: `right` must be unique per (rightKey, rightTime) — dedupe
  * first (e.g. keep max payload per key+time) or ties resolve
  * arbitrarily. NULL payload values in right rows are skipped by the
  * IGNORE NULLS carry (treated as absent, not as "reset to null").
  */
object AsOfJoin {

  def backward(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]
  ): DataFrame =
    asof(left, leftKey, leftTime, right, rightKey, rightTime, payload, forwardDir = false)

  /** Forward as-of: attach the payload of the right row with the
    * SMALLEST right time ≥ the left row's time ("the next order after
    * the event", time-to-next-action features). Same union-tag + one
    * window pass shape as [[backward]], with the carry running over the
    * FOLLOWING frame and a right row at the same instant sorting after
    * the left row (the "at or after" tie stays inclusive).
    */
  def forward(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]
  ): DataFrame =
    asof(left, leftKey, leftTime, right, rightKey, rightTime, payload, forwardDir = true)

  /** NEAREST-event join: attach the right row whose time is CLOSEST to
    * the left row's time (either direction) — the sensor/log alignment
    * join ("the reading nearest this event"). Composed as one backward
    * pass + one forward pass (each the linear union-window shape — still
    * no per-row probes, two shuffles total), then a per-row pick of the
    * closer side; equal distances prefer the BACKWARD match (the past is
    * a safer default than the future, and the tie rule must be pinned
    * for engine-portable results).
    *
    * Time columns must be NUMERIC (epoch seconds/millis) so distance is
    * plain subtraction on both engines. Output: leftCols ++ payload ++
    * `matched_t` (the chosen right time; null when the key has no right
    * rows at all).
    */
  def nearest(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val rb = payload.foldLeft(right.withColumn("_t_b", col(rightTime))) {
      (df, p) => df.withColumnRenamed(p, s"_b_$p")
    }
    val rf = payload.foldLeft(right.withColumn("_t_f", col(rightTime))) {
      (df, p) => df.withColumnRenamed(p, s"_f_$p")
    }
    val back = backward(left, leftKey, leftTime,
      rb, rightKey, rightTime, payload.map("_b_" + _) :+ "_t_b")
    val both = forward(back, leftKey, leftTime,
      rf, rightKey, rightTime, payload.map("_f_" + _) :+ "_t_f")
    val distB = col(leftTime).cast("double") - col("_t_b").cast("double")
    val distF = col("_t_f").cast("double") - col(leftTime).cast("double")
    val useB = col("_t_b").isNotNull && (col("_t_f").isNull || distB <= distF)
    val picked = payload.foldLeft(both) { (df, p) =>
      df.withColumn(p, when(useB, col(s"_b_$p")).otherwise(col(s"_f_$p")))
    }.withColumn("matched_t", when(useB, col("_t_b")).otherwise(col("_t_f")))
    picked.select((leftCols ++ payload :+ "matched_t").map(col): _*)
  }

  private def asof(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String], forwardDir: Boolean
  ): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload ${payload.mkString(",")} collides with a left column")
    // the union/window machinery rides _asof_* working columns; an input
    // already carrying one would be silently overwritten by withColumn and
    // surface as corrupted output instead of an error
    val working = Seq("_asof_k", "_asof_t", "_asof_side")
    val clash = (leftCols ++ right.columns).filter(working.contains)
    require(clash.isEmpty,
      s"input columns ${clash.distinct.mkString(",")} collide with asof working columns")
    val l = left
      .withColumn("_asof_k", col(leftKey))
      .withColumn("_asof_t", col(leftTime))
      .withColumn("_asof_side", lit(0))
    val r0 = right
      .withColumn("_asof_k", col(rightKey))
      .withColumn("_asof_t", col(rightTime))
      .withColumn("_asof_side", lit(1))
      .select(Seq("_asof_k", "_asof_t", "_asof_side").map(col) ++ payload.map(col): _*)
    val unioned = l.unionByName(r0, allowMissingColumns = true)
    // backward: right-before-left at equal times, carry the LAST payload
    // from the preceding frame; forward: left-before-right, carry the
    // FIRST payload from the following frame
    val w =
      if (forwardDir)
        Window.partitionBy("_asof_k")
          .orderBy(col("_asof_t").asc, col("_asof_side").asc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy("_asof_k")
          .orderBy(col("_asof_t").asc, col("_asof_side").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, p) =>
      val carry =
        if (forwardDir) first(col(p), ignoreNulls = true)
        else last(col(p), ignoreNulls = true)
      df.withColumn(p, carry.over(w))
    }
    carried
      .filter(col("_asof_side") === 0)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
