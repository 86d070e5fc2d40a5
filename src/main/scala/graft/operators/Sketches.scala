package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.md5Bits60

/** Bounded-memory frequency sketches. At 100 TB an exact top-k over a
  * high-cardinality key (vocabulary building over web-scale n-grams) pays
  * a full shuffle of every distinct key; the classic alternative is a
  * per-partition Misra–Gries summary — O(capacity) memory, one pass —
  * whose merged candidate set provably contains every key with true count
  * > n/capacity, followed by an exact recount of only the candidates.
  * Two narrow passes + one candidate-sized shuffle instead of a
  * vocabulary-sized one, and the result is EXACT (not approximate)
  * whenever the k-th count clears the n/capacity bound — which the
  * operator verifies from its own outputs.
  *
  * Alongside it: the two classic DECLARATIVE sketches — Count-Min
  * frequency estimation and Bloom-filter membership pruning — keyed on
  * md5-derived buckets (the one hash every engine shares, so results
  * are oracle-matchable; see TextFunctions.md5Bits60). Their scale
  * contract: a sketch relation is bounded BY CONSTRUCTION — its row
  * count is the key-domain product (depth·width cells, ≤m bits), never
  * the input size — so it is broadcast-safe at any corpus scale
  * (PlanGuardSpec.boundedKeyAgg recognizes the `pmod(_, lit)` keys
  * structurally), and partial aggregation caps what any map task ships
  * at the same bound; sketches from disjoint partitions merge by cell
  * addition / bit union, which is exactly what groupBy/distinct do.
  *
  * EXCEEDS the reference: its aggregate surface is exact
  * sum/min/max/count/avg only (SURVEY §2.4) — it ships no probabilistic
  * sketch kernels. Algorithms from the literature: Cormode &
  * Muthukrishnan (J. Algorithms 55, 2005); Bloom (CACM 1970);
  * Misra & Gries (Sci. Comput. Program. 2, 1982).
  */
object Sketches {

  /** Bucket of `key` under hash-family member `seed`:
    * md5-60-bit(key || ':' || seed) mod width. Non-negative. */
  def sketchBucket(key: Column, seed: Int, width: Long): Column =
    pmod(md5Bits60(concat(key, lit(":"), lit(seed))), lit(width))

  /** Count-Min frequency estimates for the `k` exactly-heaviest keys of
    * `df(keyCol)` (string-typed), depth×width cells, estimate = min over
    * the key's cells; CMS guarantees est >= exact. Output columns:
    * (keyCol, exact, cms_est), unordered — callers add presentation
    * order. The exact side is only for the report; a pure-sketch caller
    * would probe arbitrary keys against the same `cells` plan. */
  def countMinTopK(df: DataFrame, keyCol: String, depth: Int, width: Long,
      k: Int): DataFrame = {
    val u = col(keyCol)
    def buckets = posexplode(array((1 to depth).map(sd =>
      sketchBucket(u, sd, width)): _*))
    val cells = df
      .select(u, buckets.as(Seq("sidx", "bucket")))
      .groupBy(col("sidx"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val top = df.groupBy(u).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, u).limit(k)
    top
      .select(u, col("exact"), buckets.as(Seq("sidx", "bucket")))
      .join(broadcast(cells), Seq("sidx", "bucket"))
      .groupBy(u, col("exact"))
      .agg(min(col("cnt")).as("cms_est"))
  }

  /** Bloom-filter semi join: the rows of `probe` whose `keyCol` MIGHT be
    * in `build(keyCol)` — no false negatives, false positives bounded by
    * the filter's load factor. The filter ships as a broadcast ≤m-row
    * distinct-bit relation into `hashes` consecutive left-semi joins;
    * the probe side never shuffles. The spelled-out twin of Spark's
    * InjectRuntimeFilter bloom pruning. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      m: Long, hashes: Int): DataFrame = {
    def bit(sd: Int) = sketchBucket(col(keyCol).cast("string"), sd, m)
    val bits = build
      .select(explode(array((1 to hashes).map(bit): _*)).as("bit"))
      .distinct()
    (1 to hashes).foldLeft(probe) { (df, sd) =>
      df.join(broadcast(bits.select(col("bit").as(s"__b$sd"))),
        bit(sd) === col(s"__b$sd"), "left_semi")
    }
  }

  /** Exact top-k most frequent values of `keyCol` via per-partition
    * Misra–Gries candidate generation + exact recount.
    *
    * Pass 1 (mapPartitions — genuine per-partition imperative state, the
    * documented last-resort case): each partition streams its rows
    * through a `capacity`-counter Misra–Gries summary and emits its
    * surviving candidates. Any value occurring more than n_p/capacity
    * times in partition p survives there, so any value with global count
    * > n/capacity survives in at least one partition — the union is a
    * superset of every sufficiently-frequent key.
    *
    * Pass 2: candidates (≤ #partitions · capacity rows — cluster
    * metadata, broadcast) semi-join back onto the data for an EXACT
    * count of just those keys; rank (count desc, key asc) and keep k.
    *
    * Exactness: the result equals the true top-k whenever
    * `k-th exact count > n / capacity` (callers can check: the returned
    * `guaranteed` column is that predicate evaluated row-wise from the
    * exact counts and total n — integer cross-product, no FP). With a
    * capacity comfortably above n/f_k it is simply exact top-k.
    *
    * Output: (keyCol, cnt, guaranteed), k rows, ordered (cnt desc, key);
    * the key keeps its input type (pass 1 sketches the key's string
    * image, but candidates rejoin and rank in the original type). */
  def topKFrequent(df: DataFrame, keyCol: String, k: Int,
                   capacity: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the sketch pass also emits each partition's non-null row count
    // (isTotal = true rows), so n_total costs NO extra scan — the
    // operator is genuinely two passes over the data
    val sketch = df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counters = new java.util.HashMap[String, Long](capacity * 2)
        var nRows = 0L
        it.foreach { key =>
          if (key != null) {
            nRows += 1L
            val cur = counters.get(key)
            if (cur != 0L || counters.containsKey(key)) {
              counters.put(key, cur + 1L)
            } else if (counters.size < capacity) {
              counters.put(key, 1L)
            } else {
              // decrement-all step: amortized O(1) via iterator removal
              val iter = counters.entrySet().iterator()
              while (iter.hasNext) {
                val e = iter.next()
                if (e.getValue == 1L) iter.remove()
                else e.setValue(e.getValue - 1L)
              }
            }
          }
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Boolean, String, Long)](
          counters.size + 1)
        counters.keySet().forEach(key => out += ((false, key, 0L)))
        out += ((true, null, nRows))
        out.iterator
      }.toDF("isTotal", "_k", "n")
      // cached so cands and total share ONE sketch execution; the footprint
      // is bounded cluster metadata (≤ partitions·capacity short strings)
      .cache()
    // candidates return to the key's ORIGINAL type for the exact pass, so
    // the output schema matches the input column and ties at the k
    // boundary break in the native ordering (numeric keys order
    // numerically, not by their string image)
    val keyType = df.schema(keyCol).dataType
    val cands = sketch.filter(!col("isTotal")).select(col("_k")).distinct()
      .select(col("_k").cast(keyType).as(keyCol))
    val exact = df.select(col(keyCol)).join(broadcast(cands), Seq(keyCol))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = sketch.filter(col("isTotal"))
      .agg(sum(col("n")).as("n_total"))
    // total order (cnt desc, key asc) + limit → TakeOrderedAndProject:
    // each task ships its local k, no global window
    exact
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)
      .crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        (col("cnt") * lit(capacity.toLong) > col("n_total")).as("guaranteed"))
      .orderBy(col("cnt").desc, col(keyCol))
  }
}
