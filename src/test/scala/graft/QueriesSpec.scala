package graft

import graft.api.Relation
import org.apache.spark.sql.functions._

/** Smoke-level regression net over the whole registry (the DuckDB oracle
  * harness in tools/check.py is the authoritative value-level gate). */
class QueriesSpec extends SparkSpec {

  test("every registered query runs on sf0.001 and returns rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, sf).count() > 0) None else Some(s"$name: 0 rows")
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("relation API composes the same plan as the DataFrame API") {
    val l = Relation(Tables.load(spark, sf, "lineitem"))
    val viaRelation = l.filter(col("l_quantity") > 10)
      .group(Seq(col("l_returnflag")), Seq(count(lit(1)).as("n")))
      .order(col("l_returnflag"))
      .toDF.collect()
    val viaDF = Tables.load(spark, sf, "lineitem")
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag")).collect()
    assert(viaRelation.toSeq == viaDF.toSeq)
  }
}
