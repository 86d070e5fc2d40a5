package org.apache.spark.sql.graftarrow

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** Arrow interop surface — the Spark mapping of the reference's Arrow
  * import/export (/root/reference components/vector/arrow/
  * arrow_converter.cpp, arrow_appender.cpp export Arrow C streams from the
  * engine's vectors and back).
  *
  * Spark ships the full Arrow serialization machinery (it backs the
  * PySpark/SparkR exchange and Spark Connect) but keeps it `private[sql]`;
  * this bridge lives in an `org.apache.spark.sql` subpackage purely for
  * access and exposes the two halves as a public pair:
  *
  *   DataFrame -> Arrow IPC record-batch payloads -> DataFrame
  *
  * Batch payloads are produced DISTRIBUTED (each partition serializes its
  * own record batches, sized by `spark.sql.execution.arrow.
  * maxRecordsPerBatch`); only the final collect is driver-side, which is
  * the point of an interchange surface — handing columnar bytes to a
  * foreign runtime (the reference's pandas/polars ingest path consumes
  * exactly this shape).
  */
object ArrowBridge {

  /** Serialized Arrow record batches for the frame, one element per batch
    * (IPC stream payloads, schema implied by `df.schema`). */
  def toArrowBatches(df: DataFrame): Array[Array[Byte]] =
    df.asInstanceOf[classic.Dataset[Row]].toArrowBatchRdd.collect()

  /** Rebuilds a DataFrame from Arrow batch payloads plus the schema that
    * produced them (the IPC payloads carry data, not the schema). */
  def fromArrowBatches(spark: SparkSession, batches: Array[Array[Byte]],
                       schema: StructType): DataFrame =
    ArrowConverters.toDataFrame(batches.iterator, schema.json,
      spark.asInstanceOf[classic.SparkSession])
}
