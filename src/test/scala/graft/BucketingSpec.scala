package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders
import graft.api.GraftSession
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-located bucketed join plans with zero shuffle exchanges") {
    val facts = (1L to 10000L).map(i => (i % 500, i)).toDF("k", "v")
    val dims = (0L until 500L).map(i => (i, s"name$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)
    val joined = Bucketing.colocatedJoin(spark, "b_facts", "b_dims", "k")
      .groupBy(col("name")).agg(sum(col("v")).as("s"))
    // disable broadcast so the join must pick SMJ over the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Bucketing.colocatedJoin(spark, "b_facts", "b_dims", "k")
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(joined.count() == 500)
  }

  test("registerUdaf exposes a typed Aggregator to SQL") {
    val g = GraftSession(spark,
      graft.TmpDirs.create("graft"))
    val range = new Aggregator[Double, (Double, Double), Double] {
      def zero = (Double.MaxValue, Double.MinValue)
      def reduce(b: (Double, Double), a: Double) =
        (math.min(b._1, a), math.max(b._2, a))
      def merge(x: (Double, Double), y: (Double, Double)) =
        (math.min(x._1, y._1), math.max(x._2, y._2))
      def finish(b: (Double, Double)) = b._2 - b._1
      def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
      def outputEncoder = Encoders.scalaDouble
    }
    g.registerUdaf("val_range", range)
    Seq(1.0, 5.5, 3.0).toDF("v").createOrReplaceTempView("vals")
    assert(spark.sql("SELECT val_range(v) FROM vals").as[Double].head() == 4.5)
  }

  test("variant type round-trip (Spark 4 VARIANT for open documents)") {
    import graft.functions.Jsonb._
    val df = Seq("""{"a": {"b": 7}, "tag": "t1"}""").toDF("js")
      .select(col("js").toVariant.as("v"))
    assert(df.select(col("v").variantPath("$.a.b", "int")).as[Int].head() == 7)
    assert(df.select(col("v").variantPath("$.tag", "string")).as[String].head() == "t1")
  }

  test("writeClustered yields disjoint per-file key ranges (skippable)") {
    val out = graft.TmpDirs.create("graft_clu")
    graft.sources.Ingest.writeClustered(
      Tables.load(spark, sf, "lineitem"), out, Seq("l_orderkey"),
      numFiles = 4)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 3) // range partitioner may merge tiny tails
    // every file covers a disjoint l_orderkey range → parquet min/max
    // stats can skip whole files/row-groups for range predicates
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("l_orderkey")), max(col("l_orderkey"))).head
      (r.getLong(0), r.getLong(1))
    }
    ranges.sortBy(_._1).sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._1, s"overlapping file ranges $a / $b")
    }
  }
}
