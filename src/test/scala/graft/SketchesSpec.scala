package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Misra–Gries two-pass top-k: exactness when capacity covers the
  * distinct set, heavy-hitter guarantee when it doesn't, null hygiene. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("capacity above distinct count: equals the naive exact top-k") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(5000)(s"w${rnd.nextInt(40)}").toDF("w")
    val got = Sketches.topKFrequent(data, "w", k = 10, capacity = 256)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = data.groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    // with 40 distinct words over 5000 rows, top counts clear n/256
    assert(Sketches.topKFrequent(data, "w", k = 1, capacity = 256)
      .head().getBoolean(2))
  }

  test("eviction path: heavy hitter survives a tiny sketch, count exact") {
    // 1000 hot + 500 distinct singletons, capacity 16 forces constant
    // decrements; the hot key's global count (1000) > n/capacity (~94),
    // so it MUST survive and its recount is exact and guaranteed
    val data = (Seq.fill(1000)("hot") ++ (0 until 500).map(i => s"cold$i"))
      .toDF("w").repartition(8)
    val top = Sketches.topKFrequent(data, "w", k = 3, capacity = 16)
      .collect()
    assert(top.head.getString(0) == "hot")
    assert(top.head.getLong(1) == 1000L)
    assert(top.head.getBoolean(2))
    // singleton counts, when present, are exact recounts too
    top.tail.foreach(r => assert(r.getLong(1) == 1L && !r.getBoolean(2)))
  }

  test("nulls are ignored, not counted or emitted") {
    val data = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("w")
    val top = Sketches.topKFrequent(data, "w", k = 5, capacity = 8)
      .collect()
    assert(top.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(top.map(_.getLong(1)).toSeq == Seq(2L, 1L))
  }
}
