package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: queries are assumed small relative to the corpus, so the
  * query side is broadcast and the corpus is streamed partition-parallel —
  * the cross product never shuffles the big side. Top-k uses a window
  * ranked per query; Catalyst turns the global `orderBy.limit` pattern
  * into TakeOrderedAndProject, and the per-query variant keeps state
  * bounded by k per partition.
  */
object Similarity {

  /** Ranked per-query top-k over a (q_id, n_id, sim) candidate frame.
    * With graft's extensions installed, candidates are pruned by the
    * custom heap-based [[graft.plans.TopKPerKey]] operator (O(n log k),
    * no sort/spill) before the tiny k-row ranking window; otherwise the
    * plain window spelling runs. Output is identical either way. */
  private def rankTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    val pruned =
      if (nativeAvailable(df.sparkSession))
        graft.plans.TopKPerKey.topK(df, Seq("q_id"),
          Seq("sim" -> false, "n_id" -> true), k)
      else df
    pruned
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
  }

  /** Brute-force exact top-k cosine neighbors per query vector. O(|Q|·|C|)
    * compute but embarrassingly parallel; the baseline for recall. */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    rankTopK(
      broadcast(q).crossJoin(c)
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim",
          cosineAuto(corpus.sparkSession)(col("q_emb"), col("n_emb"))),
      k)
  }

  /** LSH-bucketed ANN: corpus is pre-bucketed by sign-LSH; a query probes
    * only its own bucket (plus optional multi-probe neighbors), so the scan
    * per query is corpus/2^planes on average — the 100 TB path. Recall is
    * tunable via nPlanes (fewer planes → bigger buckets → higher recall). */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      lshBucket(col("embedding"), planes).as("bucket"))
    rankTopK(
      broadcast(q).join(c, Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim",
          cosineAuto(corpus.sparkSession)(col("q_emb"), col("n_emb"))),
      k)
  }

  /** IVF-style ANN: k-means-lite centroids chosen as a deterministic sample,
    * corpus assigned to nearest centroid (one pass), queries probe the
    * `nProbe` nearest centroid cells. Centroid table is tiny → broadcast;
    * corpus assignment is a narrow map; the only shuffle is the final
    * per-cell candidate join. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    // Centroids are cluster metadata (≤ a few thousand rows even at 100 TB):
    // collect once and re-broadcast as literals, instead of re-running the
    // centroid job for the corpus-assignment AND query-probe subplans.
    val cents0 = corpus.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val cents = corpus.sparkSession.createDataFrame(
      cents0.collectAsList(), cents0.schema)
    val cw = Window.partitionBy(col("vec_id")).orderBy(col("d").asc, col("c_id"))
    val assigned = corpus.crossJoin(broadcast(cents))
      .withColumn("d", l2sq(col("embedding"), col("c_emb")))
      .withColumn("r", row_number().over(cw))
      .filter(col("r") === 1)
      .select(col("c_id").as("cell"), col("vec_id").as("n_id"),
        col("embedding").as("n_emb"))
    val qw = Window.partitionBy(col("vec_id")).orderBy(col("d").asc, col("c_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("d", l2sq(col("embedding"), col("c_emb")))
      .withColumn("r", row_number().over(qw))
      .filter(col("r") <= nProbe)
      .select(col("c_id").as("cell"), col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))
    rankTopK(
      broadcast(probes).join(assigned, Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim",
          cosineAuto(corpus.sparkSession)(col("q_emb"), col("n_emb"))),
      k)
  }
}
