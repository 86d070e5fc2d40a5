package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split handles joins at
  * runtime; these cover the aggregation side — a hot grouping key (one
  * customer with 10% of all events) serializes a single reducer at 100 TB.
  *
  * Two-phase salted aggregation splits each key into `buckets` synthetic
  * sub-keys for the partial pass, then combines sub-aggregates — the same
  * algebraic-decomposition trick the reference can't express (its
  * operator_group is a single-node sink) but Spark's shuffle model makes
  * natural. Only algebraic aggregates (sum/count/min/max) decompose;
  * avg = salted sum / salted count.
  */
object Skew {

  /** Adds a deterministic salt column 0..buckets-1 derived from a uniform
    * hash of the whole row (stable across retries — no rand()). */
  def withSalt(df: DataFrame, buckets: Int, salted: String = "_salt"): DataFrame =
    df.withColumn(salted, pmod(xxhash64(struct(df.columns.map(col): _*)),
      lit(buckets.toLong)).cast("int"))

  /** groupBy(keys).agg(sum, count, min, max of `valueCol`) with two-phase
    * salting. Phase 1 shuffles on (keys, salt) — hot keys fan out over
    * `buckets` reducers; phase 2 combines the (at most `buckets` ×
    * |distinct keys|) partials on the original keys. */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  buckets: Int = 16): DataFrame = {
    val salted = withSalt(df, buckets)
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_c"),
        min(col(valueCol)).as("_mn"), max(col(valueCol)).as("_mx"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_s")).as(s"sum_$valueCol"),
        sum(col("_c")).as("n"),
        min(col("_mn")).as(s"min_$valueCol"),
        max(col("_mx")).as(s"max_$valueCol"))
  }

  /** Broadcast-salted join for a skewed key set: replicates the small side
    * `buckets`× (explode) and salts the big side, so one hot key's rows
    * spread over `buckets` tasks instead of one. Equi-join results are
    * identical to the unsalted join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(buckets.toLong))
        .cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(broadcast(replicated), Seq(key, "_salt")).drop("_salt")
  }
}
