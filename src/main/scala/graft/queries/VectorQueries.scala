package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{Dedup, Similarity}

/** Embedding / similarity-search queries over the `embeddings` table
  * (`vec_id BIGINT, embedding ARRAY<FLOAT>, label INT`). Exact ops carry
  * DuckDB oracles (both engines fold the dot product left-to-right over
  * doubles → bit-identical); LSH/IVF approximate ops are rows-only.
  */
object VectorQueries {
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- per-vector norms and dimensions (sanity + pruning stats) ---
    "e1_vector_norms" -> ((s, dir) => {
      emb(s, dir)
        .select(col("vec_id"),
          size(col("embedding")).cast("int").as("dim"),
          norm(col("embedding")).as("l2"))
        .orderBy(col("vec_id"))
    }),

    // --- brute-force exact cosine top-k (ANN recall baseline) ---
    "e2_knn_brute" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 3), k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // --- label centroids: order-independent decimal accumulation so the
    // result is deterministic under any partitioning ---
    "e3_centroids" -> ((s, dir) => {
      val D = DecimalType(28, 12)
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("label"), col("i"))
        // float → double FIRST (exact binary expansion in any engine),
        // then decimal for an order-independent sum; the final round(6)
        // absorbs the ≤1e-12 cross-engine double→decimal rounding delta
        // (DuckDB's cast is double-multiply based, Spark's is exact)
        .agg(round(sum(col("x").cast("double").cast(D)).cast("double") /
          count(lit(1)).cast("double"), 6).as("c"))
        .groupBy(col("label"))
        .agg(sort_array(collect_list(struct(col("i"), col("c"))))
          .getField("c").as("centroid"))
        .orderBy(col("label"))
    }),

    // --- LSH-bucketed ANN (scale path; rows-only) ---
    "e4_knn_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshKnn(e, e.filter(col("vec_id") < 20), k = 5, nPlanes = 4)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // --- IVF-cell ANN (rows-only) ---
    "e5_knn_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfKnn(e, e.filter(col("vec_id") < 3), k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // --- embedding near-duplicate pairs via sign-LSH + cosine (rows-only) ---
    "e6_embedding_dedup" -> ((s, dir) => {
      Dedup.embeddingNearDups(emb(s, dir), "embedding", "vec_id",
          nPlanes = 4, threshold = 0.3)
        .orderBy(col("a_id"), col("b_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "e3_centroids" -> """
      WITH per AS (
        SELECT label, i,
          round(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 6) AS c
        FROM embeddings, range(1, 65) t(i)
        GROUP BY label, i)
      SELECT label, list(c ORDER BY i) AS centroid
      FROM per GROUP BY label ORDER BY label""",
    "e1_vector_norms" -> """
      SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        sqrt(list_sum(list_transform(list_zip(embedding, embedding),
          s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))) AS l2
      FROM embeddings ORDER BY vec_id""",
    "e2_knn_brute" -> """
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
                 WHERE vec_id < 3),
      sims AS (
        SELECT q.q_id, e.vec_id AS n_id,
          list_sum(list_transform(list_zip(q.q_emb, e.embedding),
            s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(list_zip(q.q_emb, q.q_emb),
               s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))))
           * sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding),
               s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))))) AS sim
        FROM q, embeddings e WHERE e.vec_id <> q.q_id),
      ranked AS (
        SELECT q_id, n_id, sim,
          ROW_NUMBER() OVER (PARTITION BY q_id
                             ORDER BY sim DESC, n_id ASC) AS rnk
        FROM sims)
      SELECT q_id, CAST(rnk AS INT) AS rnk, n_id, sim FROM ranked
      WHERE rnk <= 5 ORDER BY q_id, rnk"""
  )
}
