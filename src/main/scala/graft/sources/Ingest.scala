package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format interop (reference README.md:5 claims JSON/Parquet/ORC/Avro;
  * its in-tree paths are Arrow/pandas ingest — Spark gives all of these
  * natively, SURVEY §2.1 "File formats"). Thin, schema-aware wrappers with
  * schema-inference (the reference's pandas/Arrow inference analogue) or
  * explicit schemas. Avro needs the spark-avro connector jar, absent in
  * this image — wired but guarded. Arrow interop is native
  * (`spark.sql.execution.arrow.pyspark.enabled` for pandas exchange). */
object Ingest {

  def readJson(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", "false")
    schema.fold(r.option("inferSchema", "true"))(r.schema).json(path)
  }

  def readCsv(spark: SparkSession, path: String,
              schema: Option[StructType] = None,
              header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** In-memory ingest — the `spark.createDataFrame(pandas_df)` analogue
    * for local rows (reference python_replacement_scan). */
  def fromRows(spark: SparkSession, rows: Seq[org.apache.spark.sql.Row],
               schema: StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Hive-style partitioned parquet layout (`path/col=value/…`) — the
    * canonical 100 TB storage idiom: a filter on a partition column
    * prunes whole directories at PLANNING time (the scan's
    * `PartitionFilters`, no file I/O for pruned values), where a
    * same-cardinality filter on a data column still lists and
    * footer-checks every file. Partition by low-cardinality,
    * always-filtered columns (date, source, language); high-cardinality
    * partitioning explodes the file count. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Read back a partitioned layout; partition columns come from the
    * directory structure and stay prunable. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range-clustered parquet layout for scan-time data skipping — the
    * high-cardinality complement to [[writePartitioned]]: partition
    * directories prune low-cardinality columns (date, lang) at PLANNING
    * time; range clustering prunes high-cardinality columns (ids,
    * timestamps) at SCAN time. Rows are range-partitioned then sorted
    * within each partition on `sortCols`, so every output file covers a
    * disjoint key range and parquet column-chunk min/max statistics let a
    * pushed range predicate skip whole row groups — at 100 TB a selective
    * id/time filter reads a handful of files instead of all of them.
    * `numFiles` sizes the layout: aim for 128–1024 MB per file at scale. */
  def writeClustered(df: DataFrame, path: String, sortCols: Seq[String],
                     numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
