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

  /** Deterministic stratified sample: per-stratum fractions with a fixed
    * seed (rebalancing a language/source mix). Uses hash-based row
    * selection, so results are stable across partitionings and retries —
    * unlike rand()-based sampling. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, f).otherwise(acc)
    }
    // uniform [0,1) from a 64-bit hash of the full row + seed
    val u = (pmod(xxhash64(struct(df.columns.map(col): _*), lit(seed)),
      lit(1000000007L)).cast("double") / 1000000007.0)
    df.filter(u < frac)
  }
}
