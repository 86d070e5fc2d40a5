package graft

import org.apache.spark.sql.catalyst.plans.logical.{Expand, Window => LWindow}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Value invariants + plan-shape tripwires for AnalyticsQueries (the
  * DuckDB oracle in tools/check.py is the value-level gate; these pin the
  * scale-relevant plan properties that a hash compare can't see). */
class AnalyticsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def scansOf(name: String, file: String): Int =
    q(name).queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation
            if fs.location.rootPaths.exists(_.getName == file) => 1
        case _ => 0
      }
    }.sum

  test("pv1: explicit pivot values keep it to a single scan of orders") {
    // without the value list, pivot runs a distinct job to discover
    // columns — a second full pass over the fact table at 100 TB
    assert(scansOf("pv1_pivot", "orders.parquet") == 1)
    val cols = q("pv1_pivot").columns.toSeq
    assert(cols == Seq("m", "O", "F", "P"))
  }

  test("pv2: unpivot compiles to a narrow Expand (no shuffle, no join)") {
    val plan = q("pv2_unpivot").queryExecution.optimizedPlan
    assert(plan.collect { case e: Expand => e }.nonEmpty)
    // 5 priorities x 2 metrics
    assert(q("pv2_unpivot").count() == 10)
  }

  test("lt1: correlated LATERAL LIMIT decorrelates to one windowed pass") {
    val plan = q("lt1_lateral_topk").queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.nonEmpty,
      "expected rank-window decorrelation, not per-row subquery execution")
    assert(scansOf("lt1_lateral_topk", "orders.parquet") == 1)
  }

  test("ts1: spine is contiguous monthly and absent months are zero-filled") {
    val rows = q("ts1_gapfill").collect()
    assert(rows.exists(_.getLong(1) == 0L), "expected real gaps to fill")
    val months = rows.map(_.getTimestamp(0).toLocalDateTime)
    months.sliding(2).foreach { case Array(a, b) =>
      assert(b == a.plusMonths(1), s"spine gap between $a and $b")
    }
  }

  test("pc1: interpolated percentiles are ordered within each group") {
    q("pc1_percentile").collect().foreach { r =>
      val Seq(p25, p50, p75, p90) = (1 to 4).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90, r.toString)
    }
  }

  test("st1: moment kernels produce bounded statistics") {
    q("st1_stats").collect().foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0, s"corr out of range: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(4) >= 0.0, r.toString)
    }
  }
}
