package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * corpus assigned to nearest centroid via a NARROW argmin projection —
    * no join, no window, no shuffle between the corpus scan and its cell
    * assignment. Centroids are cluster metadata (≤ a few thousand rows even
    * at 100 TB): collected once and embedded as plan literals.
    *
    * The per-centroid score is `|c|² − 2·a·c` (argmin-equivalent to the L2
    * distance, since `|a|²` is constant per row): `|c|²` folds to a driver
    * constant and the dot runs on the native codegen'd expression, so
    * assignment is nCells tight loops per row inside whole-stage codegen. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val cents = corpus.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .collect()
    // array of (score, c_id) structs; struct ordering = (score asc, c_id
    // asc), matching the former window's ORDER BY d ASC, c_id ASC
    def scored(vec: Column): Column = array(cents.map { r =>
      val cid = r.getLong(0)
      val cemb = r.getSeq[Float](1)
      // |c|² folded on the driver with the same left-to-right double sum
      // as the engines use, so the score is deterministic
      val normSq = cemb.foldLeft(0.0)((s, v) => s + v.toDouble * v.toDouble)
      val cLit = array(cemb.map(v => lit(v.toDouble)): _*)
      struct((lit(normSq) - lit(2.0) * dotAuto(spark)(vec, cLit)).as("d"),
        lit(cid).as("c_id"))
    }: _*)
    val assigned = corpus.select(
      array_min(scored(col("embedding"))).getField("c_id").as("cell"),
      col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val probes = queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"),
        explode(slice(array_sort(scored(col("embedding"))), 1, nProbe))
          .as("p"))
      .select(col("p.c_id").as("cell"), col("q_id"), col("q_emb"))
    rankTopK(
      broadcast(probes).join(assigned, Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim",
          cosineAuto(spark)(col("q_emb"), col("n_emb"))),
      k)
  }
}
