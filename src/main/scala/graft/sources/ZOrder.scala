package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) clustering for MULTI-dimensional data skipping.
  *
  * Single-column clustering (`clusterByIndex`'s range sort) gives parquet
  * row-group min/max stats that prune range predicates on that one column.
  * A composite index sorted lexicographically only skips on the LEADING
  * column — a filter on the second column still touches every row group.
  * Interleaving the bits of all indexed columns (Morton 1966; the layout
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`) keeps rows that are close in
  * ANY dimension close on disk, so min/max stats prune range predicates on
  * EVERY indexed column at once.
  *
  * Scale shape: the per-column min/max comes from one tiny aggregate over
  * the frame being rewritten (O(#cols) driver metadata — the rewrite reads
  * those rows anyway); the z-value itself is a pure codegen'd bitwise
  * expression; the layout is `repartitionByRange(z) + sortWithinPartitions
  * (z)` — exactly the shuffle the single-key rewrite already paid.
  * Nothing about the curve limits parallelism at 100 TB.
  */
object ZOrder {

  /** Column types that can participate in a Z-order layout (orderable as
    * a long without losing the ordering). TIMESTAMP_NTZ is deliberately
    * absent: Spark 4 has no direct NTZ→long function (`unix_micros`
    * rejects it, ANSI forbids the cast), so NTZ composite indexes take
    * the lexicographic path instead of crashing the rewrite. */
  def zOrderable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType => true
    case _ => false
  }

  private def asLong(c: Column, dt: DataType): Column = dt match {
    case TimestampType =>
      // microseconds since epoch preserves order
      unix_micros(c)
    case DateType =>
      // ANSI mode forbids cast(date as long); days since epoch preserves
      // order
      unix_date(c).cast("long")
    case _ => c.cast("long")
  }

  /** Morton z-value of `cols`, each min/max-normalized to `bits` bits and
    * bit-interleaved LSB-first (column j contributes bit i to z-bit
    * i*k + j). Normalization is linear through double (53-bit mantissa —
    * exact for every range this layout heuristic can distinguish); NULLs
    * sort first (z contribution 0). k*bits must be <= 63. */
  def zValue(cols: Seq[Column], dts: Seq[DataType],
             mins: Seq[Long], maxs: Seq[Long], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1 && k * bits <= 63, s"$k cols x $bits bits exceeds long")
    val top = (1L << bits) - 1
    val scaled = cols.lazyZip(dts).lazyZip(mins).lazyZip(maxs).map {
      case (c, dt, mn, mx) =>
        val v = asLong(c, dt)
        // span and the delta are computed IN DOUBLE: a signed-64 key range
        // (e.g. xxhash64 ids, min ≈ Long.Min, max ≈ Long.Max) overflows
        // long subtraction — ANSI mode would abort the rewrite. Doubles
        // lose nothing the 16-bit bucketing can distinguish.
        val span = math.max(1.0, (BigInt(mx) - BigInt(mn)).toDouble)
        coalesce(
          least(lit(top), greatest(lit(0L),
            (((v.cast("double") - lit(mn.toDouble)) / lit(span)) *
              lit(top.toDouble)).cast("long"))),
          lit(0L))
    }
    (0 until bits).flatMap { i =>
      scaled.zipWithIndex.map { case (s, j) =>
        shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` z-clustered on `cols`: one metadata aggregate for the
    * per-column ranges, then range-repartition + sort on the interleaved
    * value. When the frame can't be z-ordered (non-orderable type, too
    * many columns, empty frame, all-NULL key) it falls back to the
    * LEXICOGRAPHIC clustered layout — never to an unclustered identity,
    * so an index always yields sorted row groups on its leading column. */
  def clusterByZOrder(df: DataFrame, cols: Seq[String],
                      bits: Int = 16): DataFrame = {
    def lexicographic: DataFrame =
      df.repartitionByRange(cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*)
    val dts = cols.map(n => df.schema(n).dataType)
    if (!dts.forall(zOrderable) || cols.size * bits > 63)
      return lexicographic
    val aggs = cols.flatMap(n => Seq(
      min(asLong(col(n), df.schema(n).dataType)),
      max(asLong(col(n), df.schema(n).dataType))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    if (stats.anyNull) return lexicographic // empty frame or all-NULL key
    val mins = cols.indices.map(i => stats.getLong(2 * i))
    val maxs = cols.indices.map(i => stats.getLong(2 * i + 1))
    val z = zValue(cols.map(col), dts, mins, maxs, bits)
    df.withColumn("_graft_z", z)
      .repartitionByRange(col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
  }
}
