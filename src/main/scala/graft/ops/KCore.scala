package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-core peeling (Seidman 1983) — the graph-family fixpoint the other
  * iterated operators don't cover: PageRank iterates VALUES on a fixed
  * graph, label propagation iterates LABELS, but the k-core peel
  * iterates the GRAPH ITSELF (drop every node of degree < k, which
  * lowers neighbors' degrees, which drops more nodes — repeat). Run a
  * FIXED number of unrolled rounds, the same bounded-iteration contract
  * as Lloyd/BPE/PageRank: each round is exactly one degree hash-agg +
  * two node-keyed semi-join trims, so the whole peel is mirrorable as
  * unrolled CTE rounds and exactly oracled.
  *
  * Scale shape per round: degrees = ONE hash-agg with map-side combine
  * over 2|E| node mentions; the trim joins are keyed on src/dst (the
  * keep-set is node-sized, broadcastable when the core is small). The
  * surviving edge set only shrinks, so round cost is non-increasing.
  * `localCheckpoint` truncates each round's lineage (the Dedup
  * pointer-jumping discipline) — without it round r re-inlines every
  * earlier round's joins into an exponentially-referenced plan tree.
  */
object KCore {

  /** `rounds` peel iterations at threshold `k` over undirected edges
    * (src < dst). Output: surviving (node, degree) after the last trim.
    */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k > 0 && rounds > 0, "KCore.peel needs k > 0, rounds > 0")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var e = edges.localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("node"))
      e = e
        .join(keep.withColumnRenamed("node", "src"), Seq("src"))
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"))
        .select("src", "dst")
        .localCheckpoint()
    }
    degrees(e).select(col("node"), col("deg").cast("long").as("degree"))
  }

  /** DuckDB mirror of [[peel]]: `edgesSql` must be a complete SELECT
    * producing (src, dst); the rounds unroll as (degree → keep → trim)
    * CTE triples.
    */
  def peelOracleSql(edgesSql: String, k: Int, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""d$r AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT src AS node FROM e${r - 1} UNION ALL SELECT dst FROM e${r - 1}
         |  ) GROUP BY 1
         |), k$r AS (
         |  SELECT node FROM d$r WHERE deg >= $k
         |), e$r AS (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN k$r s ON e.src = s.node
         |  JOIN k$r t ON e.dst = t.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |$edgesSql
       |),
       |$roundCtes
       |SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
       |  SELECT src AS node FROM e$rounds UNION ALL SELECT dst FROM e$rounds
       |) GROUP BY 1""".stripMargin
  }
}
