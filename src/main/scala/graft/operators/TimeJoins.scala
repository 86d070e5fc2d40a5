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

  /** As-of join: for every left row, the latest right row with
    * rightTime <= leftTime sharing `key`. Right's payload columns must not
    * collide with left's (rename first). Inner semantics: unmatched left
    * rows are dropped; pass `tolerance` (same unit as the time columns) to
    * also drop matches older than leftTime - tolerance. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               tolerance: Option[Long] = None): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == key || c == rightTime)
    val leftCols = left.columns
    // one unioned frame: right rows carry payload, left rows carry nulls
    val taggedRight = right
      .withColumn("_t", col(rightTime).cast("long"))
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col("_t"), col("_side"),
        col(rightTime).cast("long").as("_rt")) ++
        rightPayload.map(col) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)
    val taggedLeft = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col("_t"), col("_side"),
        lit(null).cast("long").as("_rt")) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(_ == key).map(c => col(c).as(s"_l_$c")): _*)
    // right rows sort before left at equal times → inclusive (>=) asof
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .select(Seq(col(key), col("_t"), col("_side"),
        last(col("_rt"), ignoreNulls = true).over(w).as("_matched_t")) ++
        rightPayload.map(c =>
          last(col(c), ignoreNulls = true).over(w).as(c)) ++
        leftCols.filterNot(_ == key).map(c => col(s"_l_$c")): _*)
    val matched = carried.filter(col("_side") === 1)
      .filter(col("_matched_t").isNotNull)
    val tolerated = tolerance.fold(matched)(tol =>
      matched.filter(col("_t") - col("_matched_t") <= tol))
    tolerated.select(
      Seq(col(key)) ++
      leftCols.filterNot(_ == key).map(c => col(s"_l_$c").as(c)) ++
      rightPayload.map(col): _*)
  }
}
