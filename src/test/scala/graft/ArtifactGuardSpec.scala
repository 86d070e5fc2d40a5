package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the loud-failure contract of the driver artifacts (VERDICT r8 #6):
  * a query that throws must surface as a RED row in CORRECTNESS (sentinel
  * error parquet, never an absent dir) and as -1 in BENCH (never its
  * time-to-exception). */
class ArtifactGuardSpec extends SparkSpec {

  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new RuntimeException("deliberately broken query")

  test("Verify.dumpOne writes a sentinel error parquet when a query throws") {
    val out = graft.TmpDirs.create("verify_guard")
    val ok = Verify.dumpOne(spark, "broken_query", boom, "/nonexistent", out)
    assert(!ok)
    val sentinel = spark.read.parquet(s"$out/broken_query")
    assert(sentinel.columns.toSeq == Seq("error"))
    val msg = sentinel.collect().map(_.getString(0)).mkString
    assert(msg.contains("QUERY FAILED") && msg.contains("deliberately broken"))
  }

  test("Verify.dumpOne writes the real result when the query succeeds") {
    val out = graft.TmpDirs.create("verify_guard")
    val good: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq((1L, "a")).toDF("k", "v") }
    assert(Verify.dumpOne(spark, "fine_query", good, "/nonexistent", out))
    assert(spark.read.parquet(s"$out/fine_query").count() == 1)
  }

  test("Bench.bestTime records -1 when every attempt throws") {
    assert(Bench.bestTime(3, "boom")(() => sys.error("no")) == -1.0)
  }

  test("Bench.bestTime records a nonnegative duration when any attempt works") {
    var first = true
    val t = Bench.bestTime(2, "flaky") { () =>
      if (first) { first = false; sys.error("cold start") }
    }
    assert(t >= 0.0)
  }
}
