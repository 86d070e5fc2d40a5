package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** BM25 semantics on a hand-checkable corpus: term-frequency saturation,
  * length normalization, rarity weighting, candidate confinement. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian durian durian"),
    (4L, "banana banana banana banana"))
    .toDF("doc_id", "text")

  test("single-term query: higher tf wins; non-matching docs are absent") {
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("q" -> Seq("apple")), k = 10).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
    // doc 1 has tf=2 of "apple" (same idf), so it must outscore doc 2
    val scores = out.map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(scores(1L) > scores(2L) && scores(2L) > 0L)
  }

  test("multi-term query sums per-term contributions; k truncates") {
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("q" -> Seq("apple", "banana")), k = 2).collect()
    assert(out.length == 2)
    // doc 1 matches both terms; no single-term doc can beat it
    assert(out.head.getLong(2) == 1L && out.head.getInt(1) == 1)
  }

  test("rarer terms weigh more at equal tf and dl") {
    // "cherry" (df=1) must outweigh "apple" (df=2) for the same doc shape
    val d = Seq((1L, "apple x"), (2L, "cherry x"), (3L, "apple y"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, "text", "doc_id",
      Seq("qa" -> Seq("apple"), "qc" -> Seq("cherry")), k = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("qc") > out("qa"))
  }

  test("duplicate query terms contribute once") {
    val once = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("q" -> Seq("apple")), k = 10).collect()
    val twice = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("q" -> Seq("apple", "apple")), k = 10).collect()
    assert(once.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      twice.map(r => (r.getLong(2), r.getLong(3))).toSeq)
  }

  test("persisted index: build once, query matches one-shot bm25TopK") {
    val dir = graft.TmpDirs.create("bm25idx")
    Retrieval.buildBm25Index(docs, "text", "doc_id", dir)
    val qs = Seq("q1" -> Seq("apple", "banana"), "q2" -> Seq("durian"))
    val fromIndex = Retrieval.queryBm25Index(spark, dir, qs, k = 3)
    val oneShot = Retrieval.bm25TopK(docs, "text", "doc_id", qs, k = 3)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))
    assert(fromIndex.collect().map(key).sortBy(x => (x._1, x._2)).toSeq ==
      oneShot.collect().map(key).sortBy(x => (x._1, x._2)).toSeq)
    // the query-term predicate must reach the postings parquet scan
    val scan = fromIndex.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [In(term"),
      "query terms must push into the postings scan:\n" + scan)
  }

  test("bm25 integer scoring == naive BigInt reference on random corpora") {
    // pins the micro-unit algebra (sc_micro = (idf_micro·880·tf·L) div
    // (400·tf·L + 120·L + 360·dl·N) for the default k1=1.2, b=0.75)
    // against a from-scratch BigInt implementation of the same formula —
    // if either the Spark spelling or the constant folding drifts, the
    // exact scores diverge
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(400 + seed)
      val vocab = Vector("apple", "pear", "fig", "plum", "kiwi", "yam")
      val corpus = (1L to 12L).map(i =>
        i -> (0 until (1 + r.nextInt(8))).map(_ => vocab(r.nextInt(vocab.size))))
      val df = corpus.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val queries = Seq("q1" -> Seq("apple", "fig"), "q2" -> Seq("yam"))
      val got = Retrieval.bm25TopK(df, "text", "doc_id", queries, k = 20)
        .collect()
        .map(x => (x.getString(0), x.getLong(2)) -> x.getLong(3)).toMap
      val n = corpus.size.toLong
      val bigL = corpus.map(_._2.size.toLong).sum
      def idfMicro(df0: Long): Long =
        java.math.BigDecimal.valueOf(
            StrictMath.log(1.0 + (n - df0 + 0.5) / (df0 + 0.5)))
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact
      val want = (for {
        (q, terms) <- queries
        (id, ws) <- corpus
        scores = terms.distinct.flatMap { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0) None
          else {
            val dl = ws.size.toLong
            val dfT = corpus.count(_._2.contains(t)).toLong
            val num = BigInt(idfMicro(dfT)) * 880 * tf * bigL
            val den = BigInt(400) * tf * bigL + BigInt(120) * bigL +
              BigInt(360) * dl * n
            Some((num / den).toLong)
          }
        }
        if scores.nonEmpty
      } yield (q, id) -> scores.sum).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("rrf fusion: shared docs outrank single-list docs; integer-exact") {
    val a = Seq(("q", 1L, 1), ("q", 2L, 2)).toDF("q_id", "doc_id", "rnk")
    val b = Seq(("q", 2L, 1), ("q", 3L, 2)).toDF("q_id", "doc_id", "rnk")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // d2 appears at ranks 2 and 1 -> 10^12//61 + 10^12//62; d1 only
    // 10^12//61; d3 only 10^12//62 — so the order is d2, d1, d3 and d2's
    // pico-unit score is EXACTLY the sum of the other two (integral-div
    // contributions are reused, nothing floating-point anywhere)
    assert(out.map(_._2).toSeq == Seq(2L, 1L, 3L))
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
    assert(out(0)._3 == out(1)._3 + out(2)._3)
    assert(out(1)._3 == 1000000000000L / 61)
  }

  test("rrf fusion: doc_id breaks exact score ties deterministically") {
    val a = Seq(("q", 7L, 1), ("q", 5L, 1)).toDF("q_id", "doc_id", "rnk")
    val out = Retrieval.rrfFuse(Seq(a), k = 10).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(5L, 7L))
  }

  test("phrase search: adjacency, multiplicity, and repeated-term phrases") {
    val corpus = Seq(
      (1L, "a b c a b c"),      // "a b c" at 2 start positions
      (2L, "a c b"),            // all terms present, wrong order — no hit
      (3L, "a b"),              // prefix only — no hit
      (4L, "x a b c y"),        // 1 hit mid-document
      (5L, "a a a"))            // repeated-term phrase support check
      .toDF("doc_id", "text")
    val out = Retrieval.phraseOccurrences(corpus, "text", "doc_id",
        Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 4L -> 1L))
    val rep = Retrieval.phraseOccurrences(corpus, "text", "doc_id",
        Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(5L -> 2L))   // "a a" at positions 0 and 1
  }

  test("persisted positional index: phrase results match one-shot; In pushed") {
    val corpus = Seq(
      (1L, "a b c a b c"), (2L, "a c b"), (3L, "x a b c y"))
      .toDF("doc_id", "text")
    val path = graft.TmpDirs.create("graft_pidx")
    Retrieval.buildPositionalIndex(corpus, "text", "doc_id", path)
    val fromIdx = Retrieval.queryPhraseIndex(spark, path, Seq("a", "b", "c"))
    val oneShot = Retrieval.phraseOccurrences(corpus, "text", "doc_id",
      Seq("a", "b", "c"))
    assert(fromIdx.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      oneShot.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // the term restriction reaches the postings parquet scan
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      "expected In(term,...) pushed into the postings scan:\n" + plan)
  }

  test("query-side broadcast: no shuffle introduced by term matching") {
    // the only Exchanges in the plan should be the postings groupBys and
    // the final rank window — the query/df/stats joins must all broadcast
    val plan = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("q" -> Seq("apple")), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "query-term matching must not sort-merge join:\n" + plan)
  }
}
