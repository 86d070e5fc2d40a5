package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range and as-of joins — absent from the reference (SURVEY §2.3 lists
  * them as "not implemented"; its nested-loop join would evaluate them as
  * O(n·m) theta joins). Both are expressed here as shuffle-native plans:
  *
  *  - band/range join: bucketize the range key; a |gap|-bounded predicate
  *    means matches live in the same or adjacent bucket, so the O(n²)
  *    BroadcastNestedLoopJoin becomes an equi-join on bucket id with a
  *    residual filter — shuffle-partitionable and skew-bounded.
  *  - as-of join: tag and union both sides, one sort per key on
  *    (time, side), and carry the latest right values forward with
  *    last(ignoreNulls) — no join node at all, O(n log n) per key,
  *    exactly one shuffle per side. Inclusive (left.t >= right.t)
  *    semantics, matching DuckDB/kdb ASOF.
  */
object TimeJoins {

  /** Self-join pairs (a, b) with 0 < b.key - a.key <= maxGap via adjacent
    * bucket equi-join. Output: the matched (a, b) row pairs with columns
    * prefixed a_/b_. */
  def bandedSelfJoinPairs(df: DataFrame, keyCol: String,
                          maxGap: Long): DataFrame = {
    val a = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    // a-side rows are duplicated into their own and the next bucket so any
    // in-range b (same or adjacent bucket) meets them in one equi-join
    val aB = a.withColumn("_bucket",
      explode(array(floor(col(s"a_$keyCol") / maxGap),
        floor(col(s"a_$keyCol") / maxGap) + 1)))
    val bB = b.withColumn("_bucket", floor(col(s"b_$keyCol") / maxGap))
    aB.join(bB, Seq("_bucket"))
      .filter(col(s"b_$keyCol") > col(s"a_$keyCol") &&
        col(s"b_$keyCol") - col(s"a_$keyCol") <= maxGap)
      .drop("_bucket")
  }

  /** Self interval-overlap pairs — the range-join shape (maintenance
    * windows × outages, shipment spans × shipment spans) that a naive
    * engine runs as a per-key nested loop. Rows a, b sharing `keyCol`
    * pair iff their CLOSED intervals [start,end] overlap:
    * a.start ≤ b.end ∧ b.start ≤ a.end.
    *
    * Scale shape: each interval lands in every `bucketWidth`-wide bucket
    * it touches (a narrow explode of ≤ len/width + 1 rows); candidates
    * meet in an equi-join on (key, bucket); the pair is ATTRIBUTED to
    * exactly one bucket — the one containing max(a.start, b.start),
    * which any overlapping pair shares — so no dedup pass is needed.
    * Pick `bucketWidth` ≈ the typical interval length: shorter buckets
    * explode more copies, longer buckets admit more false candidates,
    * but the join never goes quadratic in the partition size the way a
    * per-key nested loop does. Axis values must be non-negative (integer
    * `DIV` truncates toward zero, which is floor only for ≥ 0) and each
    * row must satisfy start ≤ end — normalize with least/greatest first
    * (an inverted interval would explode a DESCENDING bucket sequence
    * and silently miss candidates).
    *
    * Both output sides carry all input columns prefixed a_/b_; the
    * caller imposes its own a<b total order to halve mirrored pairs. */
  def intervalOverlapPairs(df: DataFrame, keyCol: String, startCol: String,
                           endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // enforce the documented preconditions AT RUNTIME: a violating row
    // would silently drop overlap pairs (descending bucket sequence →
    // empty explode), which is far worse than failing the job. The
    // assert_true rides the row scan as a codegen'd predicate — the
    // `.isNull` filter keeps it from being pruned as unused (assert_true
    // returns NULL when the condition holds, so no row is dropped).
    val src = df.filter(assert_true(
      col(startCol) <= col(endCol) && col(startCol) >= 0,
      lit(s"intervalOverlapPairs requires 0 <= $startCol <= $endCol on " +
        "every row")).isNull)
    val a = src.columns.foldLeft(src)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = src.columns.foldLeft(src)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val aB = a.withColumn("_bucket", explode(sequence(
      expr(s"a_$startCol div $bucketWidth"),
      expr(s"a_$endCol div $bucketWidth"))))
    val bB = b.withColumn("_bucket", explode(sequence(
      expr(s"b_$startCol div $bucketWidth"),
      expr(s"b_$endCol div $bucketWidth"))))
    aB.join(bB,
        aB(s"a_$keyCol") === bB(s"b_$keyCol") &&
          aB("_bucket") === bB("_bucket"))
      .filter(col(s"a_$startCol") <= col(s"b_$endCol") &&
        col(s"b_$startCol") <= col(s"a_$endCol") &&
        aB("_bucket") ===
          expr(s"greatest(a_$startCol, b_$startCol) div $bucketWidth"))
      .drop("_bucket")
  }

  /** As-of join: for every left row, the latest right row with
    * rightTime <= leftTime sharing `key`. Right's payload columns must not
    * collide with left's (rename first). Inner semantics: unmatched left
    * rows are dropped; pass `tolerance` (same unit as the time columns) to
    * also drop matches older than leftTime - tolerance. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val rightPayload = right.columns.filterNot(c => c == key || c == rightTime)
    val leftCols = left.columns
    // the whole right row rides as ONE struct so a genuine NULL payload
    // field stays attached to its row — carrying columns independently
    // with last(ignoreNulls) would splice values from different rows
    val rStructType = StructType(StructField("_rt", LongType) +:
      rightPayload.map(c => right.schema(c).copy(nullable = true)))
    val taggedRight = right.select(
      col(key) +: col(rightTime).cast("long").as("_t") +:
      lit(0).as("_side") +:
      struct(col(rightTime).cast("long").as("_rt") +:
        rightPayload.map(col): _*).as("_r") +:
      leftCols.filterNot(_ == key).map(c =>
        lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)
    val taggedLeft = left.select(
      col(key) +: col(leftTime).cast("long").as("_t") +:
      lit(1).as("_side") +:
      lit(null).cast(rStructType).as("_r") +:
      leftCols.filterNot(_ == key).map(c => col(c).as(s"_l_$c")): _*)
    // right rows sort before left at equal times → inclusive (>=) asof
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_m").isNotNull)
    val tolerated = tolerance.fold(matched)(tol =>
      matched.filter(col("_t") - col("_m").getField("_rt") <= tol))
    tolerated.select(
      Seq(col(key)) ++
      leftCols.filterNot(_ == key).map(c => col(s"_l_$c").as(c)) ++
      rightPayload.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * rightTime >= leftTime sharing `key` (pandas merge_asof
    * direction='forward'; [[asOfJoin]] is 'backward'). Implemented as the
    * backward join on the negated time axis — one derived column per
    * side, zero new machinery, so the two directions can never drift
    * semantically. Inclusive at equality; `tolerance` drops matches
    * farther than rightTime − leftTime. The original `leftTime` column
    * rides through as ordinary left payload (ADVICE r9: dropping it left
    * callers unable to recover the event time or compute the match gap),
    * so the output schema mirrors [[asOfJoin]]'s. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      tolerance: Option[Long] = None): DataFrame = {
    val l2 = left.withColumn("_fwd_lt", -col(leftTime).cast("long"))
    val r2 = right.withColumn("_fwd_rt", -col(rightTime).cast("long"))
      .drop(rightTime)
    asOfJoin(l2, r2, key, "_fwd_lt", "_fwd_rt", tolerance)
      .drop("_fwd_lt")
  }

  /** Regularize an irregular time series: per key, one row per `bucket`
    * between that key's first and last observation, carrying the latest
    * observed value forward across gaps (the resample + ffill of every
    * time-series stack, as one declarative plan). The bucket value is the
    * LAST observation inside the bucket (by time, then `ordCol` as the
    * deterministic tie-break); gap buckets (n_events = 0) inherit the most
    * recent earlier bucket's value. No arithmetic ever touches `valCol` —
    * values are only selected and carried, so doubles survive hash-exact.
    *
    * Scale shape: one (key, bucket) rollup shuffle over the observations,
    * a narrow per-key `sequence` explode for the grid (rows ∝ output, not
    * input), one equi-join of grid to buckets, and a per-key ordered
    * window for the fill — partitions are single series, the natural
    * time-series layout. Very long single series would range-partition
    * time first; at that point the fill becomes the asOfJoin above.
    *
    * Output: (key, bucket_ts, value, n_events, is_gap). */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, ordCol: String,
                   bucket: String = "hour"): DataFrame = {
    // struct fields are re-aliased (_t/_o/_v) so source columns named
    // "v"/"t" can never make the getField lookup ambiguous
    val obs = df.select(col(keyCol).as("k"),
      date_trunc(bucket, col(tsCol)).as("h"),
      struct(col(tsCol).as("_t"), col(ordCol).as("_o"),
        col(valCol).as("_v")).as("o"))
    // last observation per bucket: max of (ts, ord, value) structs — the
    // struct order makes it deterministic even with duplicate timestamps
    val perBucket = obs.groupBy(col("k"), col("h"))
      .agg(max(col("o")).getField("_v").as("bv"),
        count(lit(1)).as("n_events"))
    val grid = perBucket.groupBy(col("k"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("k"), explode(sequence(col("h0"), col("h1"),
        expr(s"interval 1 $bucket"))).as("h"))
    val w = Window.partitionBy(col("k")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("k", "h"), "left")
      .select(col("k"), col("h"),
        last(col("bv"), ignoreNulls = true).over(w).as("value"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .select(col("k").as(keyCol), col("h").as("bucket_ts"), col("value"),
        col("n_events"), (col("n_events") === 0L).as("is_gap"))
  }
}
