package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for an
  * UNPARTITIONED `row_number()/ntile()` window, which Spark executes by
  * dragging every row through ONE task (fine at 10⁵ rows, fatal at 10⁹;
  * VERDICT r9 flagged d24/c7 for exactly this).
  *
  * Two-pass range-partitioned rank:
  *   1. range-shuffle the frame on the sort key (`repartitionByRange` —
  *      partition i holds keys entirely before partition i+1's);
  *   2. count rows per range partition — bounded driver metadata, ONE row
  *      per shuffle partition — and prefix-sum the counts into offsets;
  *   3. rank locally inside each range partition (the window's
  *      PARTITION BY is the range-partition id, so no partition exceeds
  *      ~n/P rows) and add the broadcast offset.
  *
  * The result equals the single-partition `row_number()` EXACTLY when the
  * order is total (callers must tie-break — all graft call sites order by
  * a unique trailing key), because offsets only depend on range-partition
  * row counts, not on where boundaries fall.
  *
  * The input is locally checkpointed first: the frame is scanned twice
  * (counts + rank), and both the sampling inside `repartitionByRange` and
  * the two jobs must see the SAME input partitions for the pid↔offset map
  * to line up (the [[Dedup.connectedComponents]] per-round convention).
  */
object Ranks {

  /** Appends `rnCol` = global 1-based row number of `df` under `order`
    * (which MUST be a total order), and optionally `nCol` = total row
    * count (from the same bounded per-partition counts — no unbounded
    * `count().over()` window). */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rnCol: String,
                      nCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val snap = df.localCheckpoint()
    val parted = snap.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
    val counts = parted.groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
    val offDf = broadcast(offsets.toSeq.toDF("_pid", "_off"))
    val wLocal = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val ranked = parted
      .withColumn("_lrn", row_number().over(wLocal))
      .join(offDf, Seq("_pid"))
      .withColumn(rnCol, (col("_lrn") + col("_off")).cast("long"))
      .drop("_pid", "_lrn", "_off")
    nCol.map(c => ranked.withColumn(c, lit(n))).getOrElse(ranked)
  }

  /** `k` equal-width phases by global rank — `(rn−1)·k div n` (the exact
    * integer quantile convention shared with fe2/d24; NOT SQL `ntile`,
    * whose first `n mod k` buckets get the extra rows). Phases are
    * 0-based. Order must be total. */
  def rankPhases(df: DataFrame, order: Seq[Column], k: Int,
                 phaseCol: String): DataFrame =
    globalRowNumber(df, order, "_grn", nCol = Some("_gn"))
      .withColumn(phaseCol, expr(s"((_grn - 1) * $k) div _gn"))
      .drop("_grn", "_gn")
}
