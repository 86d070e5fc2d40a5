package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-mixing operators for training-data assembly: sequence packing
  * (fill fixed token budgets) and stratified sampling (rebalance sources/
  * languages). Both are single-shuffle window/sample plans — no driver
  * materialization, linear at 100 TB.
  */
object Mixing {

  /** Assigns each document to a fixed-token-budget pack within its
    * partition key: documents are laid out in `orderCol` order and cut
    * into packs where the running token count crosses `budget`
    * (cumulative-sum bucketing — the shuffle-native approximation of
    * greedy first-fit packing; each pack overflows by at most one doc). */
  def packByTokenBudget(df: DataFrame, partitionCol: String,
                        orderCol: String, budget: Long,
                        textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_n_tok", TextFunctions.tokenCount(col(textCol)))
      .withColumn("_cum", sum(col("_n_tok")).over(w))
      // the pack a doc STARTS in: tokens before it, divided by budget
      .withColumn("pack_id",
        ((col("_cum") - col("_n_tok")) / budget).cast("bigint"))
      .drop("_cum")
      .withColumnRenamed("_n_tok", "n_tok")
  }

  /** Sliding-window document chunking: splits each document into
    * `maxTokens`-token chunks whose starts advance by `maxTokens −
    * overlap`, tail chunk included (standard training-data chunker).
    * A narrow explode — no shuffle, no state; chunk_id is the window
    * index so output is deterministic and joinable back to the source.
    * The repartition barrier keeps the tokenize from being inlined into
    * the per-window lambda (interpreted HOFs re-evaluate per element). */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
                    maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got $overlap / $maxTokens")
    val step = maxTokens - overlap
    df.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(step)),
        s => slice(col("toks"), s + 1, lit(maxTokens)))))
      .toDF("doc_id", "chunk_id", "chunk")
      .filter(size(col("chunk")) > 0)
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", col("chunk")).as("chunk_text"),
        size(col("chunk")).as("n_tok"))
  }

  /** Deterministic stratified sample: per-stratum fractions with a fixed
    * seed (rebalancing a language/source mix). Row selection hashes
    * `keyCols` (default: all columns) + seed through md5, so results are
    * stable across partitionings and retries — unlike rand()-based
    * sampling — AND reproducible in any engine with md5 (the DuckDB
    * oracle recomputes the same selection). Pass an explicit unique key
    * (e.g. the id column) to avoid hashing wide payload columns. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 42L,
                       keyCols: Seq[String] = Nil): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, f).otherwise(acc)
    }
    val keys = if (keyCols.nonEmpty) keyCols else df.columns.toSeq
    val keyStr = concat_ws("\u0001",
      keys.map(k => col(k).cast("string")) :+ lit(seed.toString): _*)
    // uniform [0,1) from the top 60 bits of md5(keys + seed)
    val u = pmod(TextFunctions.md5Bits60(keyStr), lit(1000000007L))
      .cast("double") / 1000000007.0
    df.filter(u < frac)
  }

  /** Weighted dataset mixing under a token budget — the "mix sources to
    * target proportions" step of a training-data pipeline. Given target
    * mixture weights per stratum and a total token budget, the per-stratum
    * sampling rate is derived from the AVAILABLE token mass:
    * rate = min(1, weight·budget / availableTokens); rows are then
    * selected with the same deterministic md5 keying as
    * [[stratifiedSample]] (stable across retries/partitionings,
    * reproducible in the DuckDB oracle). Strata not in `weights` are
    * dropped. The collected per-stratum aggregate is O(#strata) — bounded
    * metadata, never data — so the plan stays two scans of the corpus
    * (one aggregate, one filtered pass), both fully distributed. */
  def mixByWeights(df: DataFrame, stratumCol: String, tokenCol: Column,
                   weights: Map[String, Double], tokenBudget: Long,
                   keyCols: Seq[String], seed: Long = 42L): DataFrame = {
    // stratum cast to string (non-string group keys must not ClassCast),
    // NULL/zero token masses dropped: a stratum with no token mass has
    // nothing to sample and a rate of budget/0 = Inf would silently
    // clamp to take-everything
    val avail = df.groupBy(col(stratumCol).cast("string").as("s"))
      .agg(sum(tokenCol).cast("double").as("tok"))
      .collect()
      .flatMap(r => Option(r.getAs[String]("s")).flatMap(k =>
        Option(r.getAs[Any]("tok")).map(t => k -> t.asInstanceOf[Double])))
      .filter(_._2 > 0d).toMap
    val rates = weights.flatMap { case (k, w) =>
      avail.get(k).map(t => k -> math.min(1.0, w * tokenBudget / t)) }
    stratifiedSample(df, stratumCol, rates, seed, keyCols)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * the log-likelihood ratio of a hashed-n-gram bag-of-words model of a
    * target distribution vs the raw distribution.
    *
    * Features are word unigrams + bigrams hashed into `buckets` buckets
    * via md5 (engine-portable, uniformly distributed); both models are
    * Laplace-smoothed bucket frequencies, the target estimated from rows
    * where `isTarget`, the raw model from all rows. The per-doc weight is
    * Σ_b c_doc(b) · [ln p̂_t(b) − ln p̂_r(b)]; docs resembling the target
    * get positive weight. Each bucket's log-ratio is rounded to 6 dp and
    * carried as DECIMAL so the weighted sum is order-independent and
    * exactly reproducible cross-engine.
    *
    * Scale shape: feature hashing is a narrow explode; the two models are
    * ONE shuffle onto `buckets` keys producing an O(buckets) frame that
    * broadcasts back onto the per-(doc,bucket) counts; the final rollup
    * shuffles on the doc id. No driver materialization.
    *
    * Output: (idCol, n_feats, w DECIMAL(28,6)).
    */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, buckets: Int = 64): DataFrame = {
    import graft.functions.TextFunctions.md5Bits60
    val base = df.select(col(idCol), isTarget.as("is_t"),
      graft.functions.TextFunctions.cleanTokens(col(textCol)).as("ws"))
    val bigrams = expr(
      "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))")
    val featArr = when(size(col("ws")) >= 2, concat(col("ws"), bigrams))
      .otherwise(col("ws"))
    val occ = base.select(col(idCol), col("is_t"),
        explode(featArr).as("feat"))
      .select(col(idCol), col("is_t"),
        pmod(md5Bits60(col("feat")), lit(buckets.toLong)).as("b"))
    val stats = occ.groupBy(col("b")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("t_b"),
      count(lit(1)).as("r_b"))
    val tot = stats.agg(sum(col("t_b")).as("t_tot"), sum(col("r_b")).as("r_tot"))
    // ln((t_b+1)/(t_tot+B)) − ln((r_b+1)/(r_tot+B)), one ln of an exact
    // double ratio; counts go through double BEFORE multiplying so the
    // products can't overflow long at petabyte feature counts
    val wB = stats.crossJoin(broadcast(tot)).select(col("b"),
      round(log(((col("t_b") + 1L).cast("double") * (col("r_tot") + lit(buckets.toLong)).cast("double")) /
                ((col("r_b") + 1L).cast("double") * (col("t_tot") + lit(buckets.toLong)).cast("double"))), 6)
        .cast("decimal(20,6)").as("w_b"))
    val perDoc = occ.groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(wB), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * col("w_b")).cast("decimal(28,6)").as("w"))
    // empty/whitespace-only docs have no features and would vanish from
    // the explode — keep them with (0, 0.000000) so a resampling join on
    // idCol never silently drops rows (the dropBoilerplateSegments
    // contract: no input row ever disappears)
    base.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w"), lit(0).cast("decimal(28,6)")).as("w"))
  }
}
