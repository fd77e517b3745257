package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-group — the (c)-tier Catalyst extension: a
  * custom `LogicalPlan` node, a planner `Strategy`, and a two-phase
  * physical operator pair, registered through `SparkSessionExtensions`
  * / `experimental.extraStrategies` ([[graft.GraftExtensions]]).
  *
  * WHY an operator instead of the window formulation: `row_number()
  * OVER (PARTITION BY g ORDER BY s) <= k` must shuffle EVERY row of
  * every group and fully sort each partition before the rank filter
  * throws almost all of it away. The dedicated operator keeps a
  * bounded k-entry heap per group on each input partition
  * ([[TopKPartialExec]] — the combiner, same role as map-side partial
  * aggregation), shuffles only the ≤ k × groups × partitions
  * survivors, and merges heaps per group after the exchange
  * ([[TopKFinalExec]]). Per-group memory is O(k); no full sort
  * anywhere. At 100 TB with rows/group ≫ k this converts the
  * dominant shuffle+sort into a partial-agg-shaped plan.
  *
  * Determinism contract: `order` must be a TOTAL order (callers pass a
  * unique tie-break column, e.g. the primary key) — then the kept set
  * and their in-group order are unique, the operator equals the
  * window formulation row-for-row (TopKSpec), and oracle hashing is
  * exact.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val planned = planLater(child)
      TopKFinalExec(g, o, k, TopKPartialExec(g, o, k, planned)) :: Nil
    case _ => Nil
  }
}

/** The shared per-partition heap pass: group rows by `groupExprs`,
  * keep the k FIRST rows of each group under `order` (a bounded
  * reverse-ordered priority queue per group — peek = worst kept row).
  */
private[plans] trait TopKHeaps { self: UnaryExecNode =>
  def groupExprs: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output

  /** emitSorted: the final operator drains each heap in sort order so
    * downstream per-group rank assignment is a trivial pass.
    */
  protected def heapPartitions(emitSorted: Boolean): RDD[InternalRow] = {
    val (g, o, kk, childOutput) = (groupExprs, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val ord: Ordering[InternalRow] = RowOrdering.create(o, childOutput)
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[InternalRow](kk, ord.reverse)
          heaps.put(key.copy(), h)
        }
        if (h.size < kk) h.add(row.copy())
        else if (ord.compare(row, h.peek()) < 0) { h.poll(); h.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        val rows = h.toArray(new Array[InternalRow](h.size))
        if (emitSorted) java.util.Arrays.sort(rows, ord)
        rows.iterator
      }
    }, preservesPartitioning = true)
  }
}

/** Map-side phase: emits ≤ k rows per (group, input partition) — the
  * only rows that can survive globally — in arbitrary order.
  */
case class TopKPartialExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode with TopKHeaps {
  override protected def doExecute(): RDD[InternalRow] =
    heapPartitions(emitSorted = false)
  override protected def withNewChildInternal(c: SparkPlan): TopKPartialExec =
    copy(child = c)
}

/** Reduce-side phase: requires clustering on the group key (the
  * planner inserts the hash exchange over the partial survivors),
  * re-runs the same bounded heap per now-complete group, and drains
  * each heap in sort order.
  */
case class TopKFinalExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode with TopKHeaps {
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    heapPartitions(emitSorted = true)
  override protected def withNewChildInternal(c: SparkPlan): TopKFinalExec =
    copy(child = c)
}

/** Entry point. Columns are referenced BY NAME and resolved here
  * against the analyzed child plan — a custom logical node's
  * expression fields sit outside the classic Column-resolution path,
  * so handing it lazily-converted Column internals would embed
  * unresolved (and unserializable) nodes; resolving to the child's
  * `AttributeReference`s up front is the standard seam.
  */
object TopK {
  /** Top `k` rows of each group under `orderBy` (`(column, ascending)`
    * pairs; MUST form a total order — include a unique tie-break).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    graft.GraftExtensions.ensureStrategies(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(a => spark.sessionState.analyzer.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"TopK.perGroup: no column '$name' in ${analyzed.output.map(_.name)}"))
    val sortOrders = orderBy.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      TopKPerGroup(groupCols.map(attr), sortOrders, k, analyzed))
  }
}
