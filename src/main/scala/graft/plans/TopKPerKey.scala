package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator (logical node + strategy +
  * physical exec, injected via GraftExtensions).
  *
  * The window-rank formulation (`row_number over (partition by key
  * order by s) <= k`) materializes and FULLY SORTS every key group;
  * this operator keeps a bounded k-element heap per key instead —
  * O(n log k) per group, O(k · #keys) memory, one shuffle on the
  * grouping key (EnsureRequirements inserts it from
  * requiredChildDistribution). This is the per-document "top chunks"
  * shape of the reference's search (qdrant.py:227) as a physical plan.
  *
  * The strategy plans TWO heap stages, exactly the partial/final split
  * of hash aggregation: a `partial = true` exec with no distribution
  * requirement runs the heap over each INPUT partition as the map side
  * (emitting <= k rows per key per partition — top-k over a union is
  * the top-k over per-stream top-ks), then the `partial = false` exec
  * requires ClusteredDistribution(keys) and merges the survivors. A
  * single final-only heap would stream EVERY row of a key through the
  * one reduce task owning it — for a handful-of-values key (language,
  * event type) that is ~N/|keys| rows into one task at 100 TB, a
  * straggler by construction. With the partial stage the exchange
  * carries <= k · |keys| rows per map partition, so a low-cardinality
  * key costs the same as a high-cardinality one. When the child's
  * partitioning already satisfies the clustering (e.g. the NSW pair
  * join's hash(cid)), EnsureRequirements inserts no exchange and the
  * final stage just re-heaps the partial's bounded output in place.
  *
  * Output rows are the per-key top-k sets, in no guaranteed order
  * (consumers sort if they need ranks). Determinism: callers include a
  * unique tie-break in `order`, so the kept SET is identical however
  * rows are split across partial heaps.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** The map-side (partial) heap consumes whatever partitioning the
    * child has; only the final merge needs key clustering.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) UnspecifiedDistribution else ClusteredDistribution(keys)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val ks = keys; val so = order; val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(ks, schema)
      val ranksEarlier = GenerateOrdering.generate(so, schema)
      // heap head = currently-worst kept row -> reverse ordering
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, ranksEarlier.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy().asInstanceOf[UnsafeRow])
        else if (ranksEarlier.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its two-stage
  * (partial map-side heap, then clustered final merge) physical form.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** df → per-key top-k rows. `orderCols` are (name, ascending) pairs
    * resolved by name against df's schema; include a unique tie-break.
    */
  def apply(df: DataFrame, keyNames: Seq[String],
            orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"no column $name among ${analyzed.output.map(_.name)}"))
    val sortOrders = orderCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      df.sparkSession, TopKPerKeyNode(keyNames.map(attr), sortOrders, k, analyzed))
  }
}
