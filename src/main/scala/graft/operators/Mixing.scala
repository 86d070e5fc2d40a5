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

  /** Temperature-flattened sampling shares — the multilingual-mix recipe
    * (mBERT / XLM-R: p_s ∝ c_s^α) that up-weights low-resource strata.
    * α is fixed at 2 so every number stays an EXACT integer (c·c, no
    * pow/exp — the determinism lint's banned transcendental class):
    *   share_ppm = ⌊c_s² · 10⁶ / Σ_s c_s²⌋
    * computed on DECIMAL(38,0) intermediates (c up to ~10¹⁵ tokens before
    * c²·10⁶ approaches the 38-digit ceiling) with integral `div`, so
    * there is no FP or rounding surface anywhere. Scale shape: ONE
    * aggregate on the stratum key; the denominator is a 1-row frame
    * cross-broadcast back — O(#strata) metadata, never data. */
  def temperatureShares(df: DataFrame, stratumCol: String,
                        tokenCol: Column): DataFrame = {
    val per = df.groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(sum(tokenCol).cast("decimal(38,0)").as("c"))
    val tot = per.agg(sum(col("c") * col("c")).cast("decimal(38,0)")
      .as("den"))
    // den = 0 only when EVERY stratum has zero/null tokens; shares are
    // undefined then — emit NULL explicitly rather than relying on the
    // engine's div-by-zero behavior (ANSI mode errors, ADVICE r9)
    per.crossJoin(broadcast(tot))
      .select(col("stratum"), col("c").cast("bigint").as("n_tokens"),
        expr("CAST(CASE WHEN den > 0 THEN (c * c * 1000000) div den " +
          "END AS BIGINT)").as("share_ppm"))
  }

  /** (id, is_t, b): every unigram+bigram feature hashed onto `buckets`
    * keys — the shared narrow explode feeding both the model aggregation
    * and the per-doc rollup. */
  private def hashedFeatures(df: DataFrame, textCol: String,
                             idCol: Option[String], isTarget: Column,
                             buckets: Int): DataFrame = {
    import graft.functions.TextFunctions.md5Bits60
    val ids = idCol.toSeq.map(col)
    val base = df.select(ids ++ Seq(isTarget.as("is_t"),
      graft.functions.TextFunctions.cleanTokens(col(textCol)).as("ws")): _*)
    val bigrams = expr(
      "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))")
    val featArr = when(size(col("ws")) >= 2, concat(col("ws"), bigrams))
      .otherwise(col("ws"))
    base.select(ids ++ Seq(col("is_t"), explode(featArr).as("feat")): _*)
      .select(ids ++ Seq(col("is_t"),
        pmod(md5Bits60(col("feat")), lit(buckets.toLong)).as("b")): _*)
  }

  /** The DSIR bucket model as driver-side metadata: for every bucket b,
    *   w_micro = round(ln((t_b+1)·(r_tot+B) / ((r_b+1)·(t_tot+B))), 6)·10⁶
    * as an exact BIGINT (counts go through double BEFORE multiplying so
    * the products can't overflow long at petabyte feature counts). ONE
    * aggregation job over the hashed features collects O(buckets)
    * exact-integer rows; the single StrictMath.log (fdlibm — bit-identical
    * on every JVM) per bucket runs on the driver so the resulting integer
    * micro-units ride as identical literals in every engine and all
    * downstream arithmetic is pure BIGINT. Buckets with no occurrences
    * get the (0+1)/(0+1) smoothed ratio. */
  def importanceModel(df: DataFrame, textCol: String, isTarget: Column,
                      buckets: Int = 64): Seq[(Long, Long)] = {
    val occ = hashedFeatures(df, textCol, None, isTarget, buckets)
    val stats = occ.groupBy(col("b")).agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("t_b"),
        count(lit(1)).as("r_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val tTot = stats.map(_._2).sum
    val rTot = stats.map(_._3).sum
    val byB = stats.map(s => s._1 -> s).toMap
    (0L until buckets.toLong).map { b =>
      val (tB, rB) = byB.get(b).map(s => (s._2, s._3)).getOrElse((0L, 0L))
      b -> graft.OracleLiterals.lnMicro6(
        (tB + 1L).toDouble * (rTot + buckets).toDouble,
        (rB + 1L).toDouble * (tTot + buckets).toDouble)
    }
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
    * get positive weight. Each bucket's log-ratio rides as a BIGINT
    * micro-unit literal (driver-computed, see [[importanceModel]]) so the
    * weighted sum is pure integer arithmetic — order-independent and
    * exactly reproducible cross-engine with no decimal parsing at all.
    *
    * Scale shape: feature hashing is a narrow explode; the model is ONE
    * shuffle onto `buckets` keys collected as O(buckets) driver metadata,
    * re-broadcast onto the per-(doc,bucket) counts; the final rollup
    * shuffles on the doc id. Pass a precomputed `model` to skip the model
    * job (and to share its literals with an external oracle).
    *
    * Output: (idCol, n_feats, w_micro BIGINT).
    */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, buckets: Int = 64,
                        model: Option[Seq[(Long, Long)]] = None)
      : DataFrame = {
    val occ = hashedFeatures(df, textCol, Some(idCol), isTarget, buckets)
    // The bucket log-ratios come from the driver (bounded metadata —
    // O(buckets) rows) rather than an in-plan ln: libm `ln` differs by
    // 1 ULP across builds, which flips the 6-dp rounding right at a
    // 0.5·10⁻⁶ boundary (CORRECTNESS_r08 d18). The SAME integer
    // micro-unit literals are injected here and into the DuckDB oracle,
    // so the check is hash-exact by construction.
    val m = model.getOrElse(importanceModel(df, textCol, isTarget, buckets))
    val spark = df.sparkSession
    import spark.implicits._
    val wB = m.toDF("b", "w_micro")
    val perDoc = occ.groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(wB), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * col("w_micro")).cast("bigint").as("w_micro"))
    val base = df.select(col(idCol))
    // empty/whitespace-only docs have no features and would vanish from
    // the explode — keep them with (0, 0) so a resampling join on
    // idCol never silently drops rows (the dropBoilerplateSegments
    // contract: no input row ever disappears)
    base.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w_micro"), lit(0L)).as("w_micro"))
  }
}
