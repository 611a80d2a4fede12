package graft.sim

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Three tiers:
  *   - `cosinePairs`: all-pairs above a threshold (exact, O(n²) compare but
  *     no shuffle amplification — the crossJoin is the cost; usable as the
  *     correctness oracle and for small n).
  *   - `bruteForceTopK`: exact top-k for a bounded query set — broadcast
  *     the queries, one narrow pass over the corpus, per-query top-k via
  *     window rank. This is the right 100 TB shape when |queries| is small:
  *     corpus is never shuffled, only the (queries × k) result is.
  *   - `ivfTopK`: IVF-style approximate search — assign every vector to
  *     its nearest centroid (broadcast centroids, narrow), then search only
  *     within the query's `nprobe` nearest clusters. Scale path: the
  *     corpus-side work drops by ~nClusters/nprobe.
  */
object Similarity {

  /** All pairs (id_a < id_b) with cosine ≥ threshold. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact cosine top-k neighbors for each query vector. Queries are
    * broadcast; ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF-style approximate top-k: cluster assignment by nearest centroid,
    * search restricted to the query's `nprobe` closest clusters.
    *
    * `centroids` is a small (cluster_id, vec) table — in a real pipeline
    * produced by k-means sampling; any deterministic seed set works for the
    * plumbing. Both assignment joins broadcast the centroid table.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 2
  ): DataFrame = {
    val cent = centroids.select(col("cluster_id"), col("cvec"))

    def assign(df: DataFrame, id: String, out: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(desc("csim"), asc("cluster_id"))
      df.join(broadcast(cent))
        .withColumn("csim", VectorOps.cosine(col(vecCol), col("cvec")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .select(col(id), col(vecCol).as(out), col("cluster_id"))
    }

    val corpusAssigned = assign(corpus.select(col(idCol).as("neighbor_id"), col(vecCol)), "neighbor_id", "cv", 1)
    val queryAssigned  = assign(queries.select(col(idCol).as("query_id"), col(vecCol)), "query_id", "qv", nprobe)

    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    corpusAssigned
      .join(broadcast(queryAssigned), Seq("cluster_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
