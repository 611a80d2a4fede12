package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation —
  * the graph-shape statistic (clustering, community density) computed
  * the way a 1000-executor engine has to.
  *
  * Orientation: every undirected edge points from its lower-(degree, id)
  * endpoint to the higher one. Each triangle then has EXACTLY one corner
  * with two out-edges, so counting closed wedges counts each triangle
  * once. The payoff is the wedge bound: out-degree under this orientation
  * is O(√m) for every node (arboricity argument), so wedge generation is
  * O(m^1.5) worst-case — a degree-d hub would generate d² wedges
  * un-oriented, but its oriented out-degree stays √-bounded. This is the
  * standard MapReduce/GraphX formulation (Suri & Vassilvitskii's
  * "Counting Triangles and the Curse of the Last Reducer").
  *
  * Plan shape: canonicalize+distinct (one shuffle), degree aggregation
  * (one shuffle), two equi-joins to attach endpoint degrees, a self-join
  * on the wedge corner, and the closing-edge equi-join — every join is a
  * hash join on explicit keys; nothing is quadratic in a hub's degree.
  */
object Triangles {

  /** One row: (n_edges, n_triangles) over the cleaned undirected graph.
    * Self-loops are dropped and parallel/reversed duplicates collapse via
    * canonicalization to (a < b) + distinct.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol))
      .select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val deg = canon
      .select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient each edge from its lower-(deg, id) endpoint; canon already
    // has a < b, so on equal degrees `a` stays the source
    val oriented = canon
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("w"),
        when(col("da") <= col("db"), col("db")).otherwise(col("da")).as("dw"))
    // wedges (w1, w2) out of a shared corner, ordered by the SAME
    // (deg, id) key as the orientation — the closing edge, if present,
    // is then oriented w1 -> w2 by construction
    val o1 = oriented.select(col("u"), col("w").as("w1"), col("dw").as("d1"))
    val o2 = oriented.select(col("u"), col("w").as("w2"), col("dw").as("d2"))
    val wedges = o1.join(o2,
      Seq("u")).filter(
      col("d1") < col("d2") || (col("d1") === col("d2") && col("w1") < col("w2")))
    val closed = wedges.join(
      oriented.select(col("u").as("w1"), col("w").as("w2")),
      Seq("w1", "w2"))
    canon.agg(count(lit(1)).as("n_edges"))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }

  /** DuckDB mirror of [[triangleCount]] — the orientation is a perf strategy, not
    * a semantic, so the oracle counts (a<b<c) closed triples directly.
    */
  def countOracleSql(edgesSql: String): String =
    s"""WITH raw AS ($edgesSql),
       |e AS (
       |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM raw WHERE src <> dst
       |)
       |SELECT (SELECT count(*) FROM e) AS n_edges,
       |       (SELECT count(*) FROM e e1
       |          JOIN e e2 ON e1.b = e2.a
       |          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""".stripMargin
}
