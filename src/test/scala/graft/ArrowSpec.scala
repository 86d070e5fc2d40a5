package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftarrow.ArrowBridge

/** Arrow interchange round-trip (reference arrow_converter.cpp /
  * arrow_appender.cpp: engine vectors <-> Arrow C stream). Proves this
  * Spark build's Arrow-optimized exchange works end to end: typed frame ->
  * distributed Arrow IPC record batches -> frame, value- and
  * schema-identical, with batch sizing honoring the Arrow config. */
class ArrowSpec extends SparkSpec {
  import spark.implicits._

  test("Arrow round-trip: DataFrame -> IPC record batches -> DataFrame") {
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try {
      val df = spark.range(1000).repartition(4).select(
        col("id"),
        (col("id") * 2).as("twice"),
        concat(lit("s"), col("id")).as("s"),
        (col("id") % 2 === 0).as("even"),
        (col("id").cast("double") / 3.0).as("d"))
      val batches = ArrowBridge.toArrowBatches(df)
      // 4 partitions x 250 rows at <=100 rows/batch -> at least 3 per part
      assert(batches.length >= 8,
        s"expected many small batches, got ${batches.length}")
      assert(batches.forall(_.length > 0))
      val back = ArrowBridge.fromArrowBatches(spark, batches, df.schema)
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
        == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(back.orderBy("id").collect().toSeq
        == df.orderBy("id").collect().toSeq)
    } finally spark.conf
      .unset("spark.sql.execution.arrow.maxRecordsPerBatch")
  }

  test("Arrow round-trip preserves a real table (strings + ints)") {
    val nation = Tables.load(spark, sf, "nation")
    val batches = ArrowBridge.toArrowBatches(nation)
    val back = ArrowBridge.fromArrowBatches(spark, batches, nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq
      == nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("self-describing IPC stream round-trips with no out-of-band schema") {
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try {
      val df = spark.range(500).repartition(3).select(
        col("id"),
        concat(lit("v"), col("id")).as("s"),
        (col("id").cast("double") * 1.5).as("d"))
      val stream = ArrowBridge.toArrowStream(df)
      // IPC framing: every message starts with the 0xFFFFFFFF continuation
      // token; the stream ends with token + zero-length (EOS)
      assert(stream.take(4).forall(_ == -1), "missing continuation token")
      assert(stream.takeRight(8).toSeq ==
        Seq[Byte](-1, -1, -1, -1, 0, 0, 0, 0), "missing EOS marker")
      // the ONLY inputs are the bytes — schema travels in-band
      val back = ArrowBridge.fromArrowStream(spark, stream)
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
        == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(back.orderBy("id").collect().toSeq
        == df.orderBy("id").collect().toSeq)
    } finally spark.conf
      .unset("spark.sql.execution.arrow.maxRecordsPerBatch")
  }

  test("IPC stream of a real table parses from bytes alone") {
    val nation = Tables.load(spark, sf, "nation")
    val back = ArrowBridge.fromArrowStream(spark,
      ArrowBridge.toArrowStream(nation))
    assert(back.orderBy("n_nationkey").collect().toSeq
      == nation.orderBy("n_nationkey").collect().toSeq)
  }
}
