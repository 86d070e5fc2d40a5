package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading helpers shared by SparkEntry / Verify / Bench / tests.
  *
  * All driver test tables are single parquet files under a scale-factor
  * directory (see /root/repo/TESTDATA.md). At cluster scale the same code
  * path reads a partitioned parquet directory — `spark.read.parquet` is
  * agnostic; filter pushdown + column pruning happen in Catalyst either way.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
    // read nanos as epoch-nano longs and convert explicitly where needed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` (epoch nanos as long) plus a proper microsecond
    * timestamp column `t` (floor-truncated, matching CAST(ns AS TIMESTAMP)). */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("t", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))

  /** Registers every test table as a temp view so `spark.sql` text matches
    * the DuckDB oracle dialect as closely as possible. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
