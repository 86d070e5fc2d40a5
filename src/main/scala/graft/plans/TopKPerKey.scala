package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension (build-brief path (c): custom
  * LogicalPlan + SparkStrategy + SparkPlan wired through
  * SparkSessionExtensions): per-key top-k without sorting.
  *
  * The stock spelling — `row_number().over(Window.partitionBy(keys)
  * .orderBy(ord)) <= k` — SORTS every partition's full candidate set
  * (O(n log n) and a spill risk at 100 TB fan-outs); ANN candidate scoring
  * only ever needs the k best per query. This operator keeps a bounded
  * binary heap per key: O(n log k), O(keys·k) memory, no sort, no spill.
  *
  * Physical contract: requires clustering by the grouping keys (Catalyst
  * inserts the exchange), then a single heap pass per partition. Rows are
  * emitted grouped per key in sort order — rank can be zipped on cheaply
  * downstream if needed.
  */
case class TopKPerKey(k: Int, grouping: Seq[Expression],
                      order: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, grouping, order, child) =>
      // two-phase like hash aggregation: a map-side partial heap (no
      // distribution requirement — topK is algebraic: topK(A∪B) =
      // topK(topK(A)∪topK(B))) shrinks each input partition to ≤k rows
      // per key BEFORE the exchange, so the shuffle moves k·|keys| rows,
      // not the candidate set
      TopKPerKeyExec(k, grouping, order,
        TopKPerKeyExec(k, grouping, order, planLater(child),
          partial = true)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, grouping: Seq[Expression],
                          order: Seq[SortOrder], child: SparkPlan,
                          partial: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(grouping) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(grouping, childOutput)
      val ordering = GenerateOrdering.generate(order, childOutput)
      // max-heap of the k best: peek() is the WORST retained row, so a
      // candidate only enters if it beats it — O(log k) per improvement
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](k + 1,
            ordering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values.forEach { h =>
        val rows = new java.util.ArrayList[InternalRow](h)
        rows.sort(ordering)
        rows.forEach(r => out += r)
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  /** API builder: `topK(df, Seq("q_id"), Seq("sim" -> false, "n_id" -> true), 5)`
    * — order pairs are (column, ascending). Attributes are resolved by
    * name against the analyzed child plan (the builder plays analyzer for
    * this one node; everything below is standard Catalyst). */
  def topK(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)],
           k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"no column $n in ${analyzed.output.map(_.name).mkString(",")}"))
    val sortOrders = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlShim.ofRows(df.sparkSession,
      TopKPerKey(k, keys.map(attr), sortOrders, analyzed))
  }
}
