package graft

import org.apache.spark.sql.SparkSession

/** Regenerates the committed oracle-literal snapshot (the compiled-in
  * [[OracleLiteralsSnapshot]] source AND the classpath resource) from
  * fresh sf0.01 models: builds exactly the stash-dependent queries —
  * building a query runs its bounded driver-side model jobs, which stash
  * the literal fragments — then [[OracleLiterals.persist]] writes every
  * channel. Deterministic on any host: the models are exact integer
  * counts + StrictMath.log (fdlibm) + BigDecimal HALF_UP, so the
  * regenerated constant is bit-identical wherever the parquet is.
  *
  * Usage: `sbt "runMain graft.SnapshotGen [/root/testdata/sf0.01]"`,
  * then recompile and commit the regenerated
  * `src/main/scala/graft/OracleLiteralsSnapshot.scala`.
  */
object SnapshotGen {
  /** Queries whose BUILD stashes every hash-checked literal key
    * (d18_w, g3_lp, bm25_idf, e12_lut). Kept in one place so the
    * staleness spec and this generator can never drift. */
  val StashQueries: Seq[String] =
    Seq("d18_dsir_weights", "g3_bigram_xent", "ir1_bm25", "e12_pq_adc")

  /** Every key those builds are expected to stash. */
  val StashKeys: Seq[String] = Seq("d18_w", "g3_lp", "bm25_idf", "e12_lut")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StashQueries.foreach(q => SparkEntry.queries(q)(spark, sfDir))
    val missing = StashKeys.filter(OracleLiterals.stashed(_).isEmpty)
    require(missing.isEmpty,
      s"query builds did not stash: ${missing.mkString(", ")}")
    OracleLiterals.persist(sfDir)
    spark.stop()
  }
}
