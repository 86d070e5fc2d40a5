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
}
