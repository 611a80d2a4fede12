package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth BFS: minimum hop distance from a seed set, the
  * "blast radius" / reachability query (affected downstream nodes of a
  * failing dependency, contacts-of-contacts, citation depth).
  *
  * Same Pregel-style iterated-join shape as [[PageRank]]: each hop is a
  * join of the (node-sized) frontier against the edge table keyed on
  * src, then ONE min-aggregation keyed on node. Distances are exact
  * integers — monotone under min-merge, so the result is
  * partition-invariant and the DuckDB oracle (the same rounds, unrolled
  * as CTEs) matches hash-for-hash. k hops = k passes; nothing
  * driver-side at all.
  *
  * At real scale: persist `edges` (probed k times) — callers hold the
  * edge frame; the loop itself adds no pins.
  */
object Bfs {

  /** @param edges directed (src, dst) pairs, BIGINT-compatible.
    * @param seeds one column of seed node ids (dist 0).
    * @return (node, dist) for every node within `maxHops` of a seed.
    */
  def kHopDistances(edges: DataFrame, srcCol: String, dstCol: String,
                    seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 10, s"maxHops in [1,10], got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    var dist = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().withColumn("dist", lit(0))
    for (_ <- 1 to maxHops) {
      val stepped = dist.join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      dist = dist.unionByName(stepped)
        .groupBy("node").agg(min("dist").as("dist"))
    }
    dist
  }

  /** DuckDB mirror of [[kHopDistances]] — the same min-merge rounds
    * unrolled as CTEs over (edgesSql, seedsSql). */
  def kHopOracleSql(edgesSql: String, seedsSql: String, maxHops: Int): String = {
    val rounds = (1 to maxHops).map { h =>
      val prev = s"d${h - 1}"
      s"""d$h AS (
         |  SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM $prev
         |    UNION ALL
         |    SELECT e.dst AS node, $prev.dist + 1 AS dist
         |    FROM $prev JOIN e ON $prev.node = e.src
         |  ) GROUP BY 1
         |)"""
    }.mkString(",\n")
    s"""WITH e AS ($edgesSql),
       |d0 AS (SELECT DISTINCT node, 0 AS dist FROM ($seedsSql)),
       |$rounds
       |SELECT node, dist FROM d$maxHops""".stripMargin
  }
}
