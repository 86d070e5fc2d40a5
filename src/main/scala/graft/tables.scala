package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Shared physical-layout helpers for the operator library. */
object Spread {
  /** Hash-repartition on `key` at the session's configured shuffle
    * parallelism, with the partition count PINNED (passing it explicitly
    * opts the exchange out of AQE partition coalescing). The coalescer
    * sizes partitions by shuffle BYTES, but the operators using this
    * barrier put heavy per-row CPU (regex tokenize, shingle+minhash,
    * per-dim explodes) ABOVE the exchange — on their small-bytes/high-CPU
    * frames AQE folds the shuffle back to one or two tasks and the work
    * runs serial. The count stays conf-driven (spark.sql.shuffle.
    * partitions), so cluster deployments scale it with the cluster, and
    * low-core local runs stay at their core count. */
  def by(df: DataFrame, key: Column): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, key)
}

/** Table loading helpers shared by SparkEntry / Verify / Bench / tests.
  *
  * All driver test tables are single parquet files under a scale-factor
  * directory (see /root/repo/TESTDATA.md). At cluster scale the same code
  * path reads a partitioned parquet directory — `spark.read.parquet` is
  * agnostic; filter pushdown + column pruning happen in Catalyst either way.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Timestamp physical-type tolerance (the driver has regenerated
    // events.parquet with different encodings across rounds):
    //  - TIMESTAMP(NANOS), which Spark's reader rejects outright → read
    //    the nanos as epoch-long instead and convert where needed;
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 would
    //    surface as TIMESTAMP_NTZ → read as plain TimestampType. The
    //    parquet value is passed through as micros-since-epoch unchanged
    //    (no session-timezone shift on read), and every session here runs
    //    UTC, so this matches DuckDB's naive-timestamp oracle semantics.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Adds the canonical microsecond event-time column `t` (TimestampType)
    * to an events-shaped frame, dispatching on the physical type `ts`
    * arrived as. Downstream code uses `t` (and `unix_micros(t)` for epoch
    * math) exclusively, so query code is independent of how the driver
    * encoded the column this round. */
  def withEventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      // epoch-nanos long (legacy TIMESTAMP(NANOS) surfaced via
      // nanosAsLong): floor-truncate to micros, matching CAST(ns AS
      // TIMESTAMP) in the oracle engine. NOTE: on this path `t` is a
      // DERIVED column, so time-band predicates on `t` cannot reach the
      // parquet scan as PushedFilters (they do on the canonical
      // TIMESTAMP path below — pinned in PlanGuardSpec via c24).
      case LongType => df.withColumn("t", timestamp_micros(expr("ts DIV 1000")))
      // already a micros timestamp: use as-is.
      case TimestampType => df.withColumn("t", col("ts"))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other — expected epoch-nanos " +
          "BIGINT or TIMESTAMP")
    }

  /** events with a proper microsecond timestamp column `t` (see
    * [[withEventTime]] for the physical-type dispatch). */
  def events(spark: SparkSession, dir: String): DataFrame =
    withEventTime(load(spark, dir, "events"))

  /** Registers every test table as a temp view so `spark.sql` text matches
    * the DuckDB oracle dialect as closely as possible. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
