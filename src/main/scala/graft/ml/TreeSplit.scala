package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT greedy CART split search (Breiman et al. 1984, the inner loop of
  * every decision-tree/GBDT fit): for every low-cardinality feature and
  * every candidate threshold, the Gini impurity of the `x ≤ t` / `x > t`
  * partition — the full candidate table a tree fit would argmin over.
  *
  * The reference fits trees through sklearn's opaque C loop
  * (Hap880_Final_Project.py:379-382, RandomForest); this is the split
  * criterion itself as data, exactly comparable across engines:
  * Gini(S) = 1 − (pos² + neg²)/n² evaluates in micro-units as integer
  * arithmetic plus ONE correctly-rounded divide per side (longs cast to
  * double round identically everywhere; a .5 quotient rounds away from
  * zero on both engines), and the weighted split score is one more such
  * divide over exact integer mass.
  *
  * Scale shape: ONE pass over the corpus — every feature's value
  * histogram rides a single explode + hash-agg (k features cost one scan,
  * not k) — then cumulative windows over the ≤Σ|distinct| histogram rows
  * (bounded by construction: callers pass enumerable features). No
  * per-candidate scans, no driver loop; the 100 TB cost is the one
  * map-side-combined aggregation.
  *
  * Overflow audit (ANSI mode throws on long overflow): the impurity
  * numerator pos²+neg² would overflow Long past ~3·10⁶-row sides, so it
  * is accumulated in DECIMAL(38,0) unconditionally — exact to n ≈ 10¹⁵,
  * negligible cost on the bounded histogram, and the same single
  * decimal→double conversion both engines perform.
  */
object TreeSplit {

  /** 1 000 000 − round(10⁶·(pos² + neg²)/n²), the Gini impurity in
    * micro-units from exact long counts. The squared numerator and
    * denominator are accumulated in DECIMAL(38,0) unconditionally —
    * pos²+neg² overflows Long past side counts of ~3·10⁶ rows, and the
    * histogram this runs over is tiny, so the exact-decimal form costs
    * nothing and removes the bound (safe to n ≈ 10¹⁵; each product is
    * exact, the 10⁶ scale stays inside DECIMAL(38,0), and the single
    * decimal→double cast is the same one correctly-rounded conversion
    * the long form performed).
    */
  private def giniMicros(pos: Column, n: Column): Column = {
    val posD = pos.cast("decimal(19,0)")
    val negD = (n - pos).cast("decimal(19,0)")
    val nD = n.cast("decimal(19,0)")
    lit(1000000L) - round(
      ((posD * posD + negD * negD) * 1000000L).cast("decimal(38,0)").cast("double") /
        (nD * nD).cast("double")).cast("long")
  }

  /** All (feature, threshold) split candidates with exact side counts and
    * micro-unit impurities, one row per candidate. `features` maps output
    * feature names to (numeric, low-cardinality) columns; the split is
    * `v ≤ threshold` and thresholds where the right side would be empty
    * are dropped. Output: (feature, threshold, n_left, n_right, pos_left,
    * pos_right, gini_left_micros, gini_right_micros, wgini_micros) — the
    * best split is the wgini_micros argmin.
    */
  def splitCandidates(df: DataFrame, label: Column,
                      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "splitCandidates needs at least one feature")
    val packed = explode(array(features.map { case (name, c) =>
      struct(lit(name).as("feature"), c.cast("double").as("v"))
    }: _*))
    val hist = df
      .select(label.cast("long").as("_y"), packed.as("f"))
      .groupBy(col("f.feature").as("feature"), col("f.v").as("v"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("pos"))
    val wCum = Window.partitionBy("feature").orderBy("v")
    val wAll = Window.partitionBy("feature")
    val sides = hist.select(
      col("feature"), col("v"),
      sum("n").over(wCum).as("nl"), sum("pos").over(wCum).as("posl"),
      sum("n").over(wAll).as("nt"), sum("pos").over(wAll).as("post"))
      .filter(col("nl") < col("nt"))
      .select(
        col("feature"), col("v").as("threshold"),
        col("nl").as("n_left"), (col("nt") - col("nl")).as("n_right"),
        col("posl").as("pos_left"), (col("post") - col("posl")).as("pos_right"),
        col("nt"))
    sides
      .withColumn("gini_left_micros", giniMicros(col("pos_left"), col("n_left")))
      .withColumn("gini_right_micros", giniMicros(col("pos_right"), col("n_right")))
      .withColumn("wgini_micros", round(
        (col("n_left") * col("gini_left_micros") +
          col("n_right") * col("gini_right_micros")).cast("double") /
          col("nt").cast("double")).cast("long"))
      .drop("nt")
  }

  /** DuckDB mirror of [[splitCandidates]]: `histSql` must yield
    * (feature, v, n, pos) — the per-feature value histograms (the oracle
    * runs one GROUP BY per feature UNION ALL'd; same totals, any plan).
    * Identical windows, identical integer/divide shapes.
    */
  def splitCandidatesOracleSql(histSql: String): String =
    s"""WITH h AS ($histSql),
       |c AS (
       |  SELECT feature, v,
       |    SUM(n) OVER (PARTITION BY feature ORDER BY v) AS nl,
       |    SUM(pos) OVER (PARTITION BY feature ORDER BY v) AS posl,
       |    SUM(n) OVER (PARTITION BY feature) AS nt,
       |    SUM(pos) OVER (PARTITION BY feature) AS post
       |  FROM h
       |), s AS (
       |  SELECT feature, v AS threshold,
       |    CAST(nl AS BIGINT) AS n_left, CAST(nt - nl AS BIGINT) AS n_right,
       |    CAST(posl AS BIGINT) AS pos_left,
       |    CAST(post - posl AS BIGINT) AS pos_right, CAST(nt AS BIGINT) AS nt
       |  FROM c WHERE nl < nt
       |), g AS (
       |  SELECT *,
       |    1000000 - CAST(round(
       |      CAST((pos_left * pos_left +
       |            (n_left - pos_left) * (n_left - pos_left)) * 1000000 AS DOUBLE) /
       |      CAST(n_left * n_left AS DOUBLE)) AS BIGINT) AS gini_left_micros,
       |    1000000 - CAST(round(
       |      CAST((pos_right * pos_right +
       |            (n_right - pos_right) * (n_right - pos_right)) * 1000000 AS DOUBLE) /
       |      CAST(n_right * n_right AS DOUBLE)) AS BIGINT) AS gini_right_micros
       |  FROM s
       |)
       |SELECT feature, threshold, n_left, n_right, pos_left, pos_right,
       |  CAST(gini_left_micros AS BIGINT) AS gini_left_micros,
       |  CAST(gini_right_micros AS BIGINT) AS gini_right_micros,
       |  CAST(round(
       |    CAST(n_left * gini_left_micros + n_right * gini_right_micros AS DOUBLE) /
       |    CAST(nt AS DOUBLE)) AS BIGINT) AS wgini_micros
       |FROM g""".stripMargin
}
