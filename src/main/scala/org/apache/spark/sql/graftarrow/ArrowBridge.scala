package org.apache.spark.sql.graftarrow

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels

import scala.collection.mutable.ArrayBuffer

import org.apache.arrow.vector.VectorUnloader
import org.apache.arrow.vector.ipc.{ArrowStreamReader, WriteChannel}
import org.apache.arrow.vector.ipc.message.MessageSerializer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

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

  /** A complete, SELF-DESCRIBING Arrow IPC stream for the frame: schema
    * message, then every record batch, then the end-of-stream marker.
    * Any stock Arrow reader (`pyarrow.ipc.open_stream`, polars, an Arrow
    * C++ consumer) reads it with no out-of-band schema — the Spark
    * mapping of the reference's complete Arrow C-stream export
    * (/root/reference components/vector/arrow/arrow_converter.cpp).
    *
    * Batch serialization stays distributed ([[toArrowBatches]]); only the
    * framing (schema header + EOS) is added on the driver. Each IPC
    * message is already 8-byte aligned, so payloads concatenate as-is. */
  def toArrowStream(df: DataFrame): Array[Byte] = {
    val timeZoneId = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val arrowSchema = ArrowUtils.toArrowSchema(df.schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val out = new ByteArrayOutputStream()
    val channel = new WriteChannel(Channels.newChannel(out))
    MessageSerializer.serialize(channel, arrowSchema)
    toArrowBatches(df).foreach(out.write)
    channel.writeIntLittleEndian(MessageSerializer.IPC_CONTINUATION_TOKEN)
    channel.writeIntLittleEndian(0) // zero-length metadata = end of stream
    out.toByteArray
  }

  /** Reads a self-describing Arrow IPC stream (schema + batches + EOS)
    * back into a DataFrame — the inverse of [[toArrowStream]], accepting
    * streams produced by any Arrow writer, not just ours. */
  def fromArrowStream(spark: SparkSession, stream: Array[Byte]): DataFrame = {
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-arrow-stream", 0, Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(stream),
      allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val sparkSchema = ArrowUtils.fromArrowSchema(root.getSchema)
      // re-frame each batch as a standalone IPC payload for the existing
      // batch-level ingest path
      val batches = ArrayBuffer.empty[Array[Byte]]
      while (reader.loadNextBatch()) {
        val out = new ByteArrayOutputStream()
        val ch = new WriteChannel(Channels.newChannel(out))
        val batch = new VectorUnloader(root).getRecordBatch
        try MessageSerializer.serialize(ch, batch)
        finally batch.close()
        batches += out.toByteArray
      }
      ArrowConverters.toDataFrame(batches.iterator, sparkSchema.json,
        spark.asInstanceOf[classic.SparkSession])
    } finally {
      reader.close()
      allocator.close()
    }
  }
}
