package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator tier of the Catalyst extension surface: a custom
  * LogicalPlan + SparkStrategy + SparkPlan implementing the backward
  * as-of join as a PHYSICAL sort-merge — the plan a native engine (or
  * pandas `merge_asof`) would run, and the scale path next to the
  * union+window composition in `DocumentStore.asofJoin` (which stays as
  * the oracle-checked baseline; `AsofSpec` asserts both produce identical
  * rows).
  *
  * Physical shape: both sides hash-clustered on the key and sorted within
  * partitions by (key, time) — exactly a sort-merge join's requirements,
  * declared via `requiredChildDistribution` / `requiredChildOrderings` so
  * EnsureRequirements inserts (or elides, when the data is already
  * bucketed) the exchanges and sorts. Each partition pair then merges in
  * ONE streaming pass: for every left row, the latest right row of the
  * same key with `rightTime <= leftTime` rides along; right rows are
  * consumed at most once (O(|L| + |R|) per partition, one buffered right
  * row — no window state, no union materialization).
  *
  * Constraints (the document-store contract): key and time are LongType
  * and non-null; right side unique per (key, time) — ties at equal time
  * match (`<=` semantics), identical to DuckDB ASOF JOIN.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        key: String, time: String, asofCols: Seq[String],
                        outputAttrs: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = outputAttrs
  // the asof_<c> attributes are GENERATED here (fresh expr-ids), not
  // forwarded from a child — declare them so CheckAnalysis's
  // missing-input rule accepts the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs.drop(left.output.size))
  // key/time/asof columns are named by STRING, invisible to the default
  // expression-derived references — declare them or ColumnPruning strips
  // the children bare under a parent that needs no columns (count(*))
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++
      right.output.filter(a => a.name == key || a.name == time || asofCols.contains(a.name)))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinPlan {
  /** Output = all left columns + `asof_<c>` (nullable) per asof column. */
  def forChildren(left: LogicalPlan, right: LogicalPlan,
                  key: String, time: String, asofCols: Seq[String]): AsofJoinPlan = {
    val asofAttrs = asofCols.map { c =>
      val a = right.output.find(_.name == c)
        .getOrElse(throw new IllegalArgumentException(s"right side lacks column $c"))
      AttributeReference(s"asof_$c", a.dataType, nullable = true)()
    }
    AsofJoinPlan(left, right, key, time, asofCols, left.output ++ asofAttrs)
  }
}

/** Planner strategy mapping the logical node to its physical exec —
  * injected via `GraftExtensions.injectPlannerStrategy` (or added to
  * `spark.experimental.extraStrategies` per session).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(p.key, p.time, p.asofCols, p.outputAttrs,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(key: String, time: String, asofCols: Seq[String],
                        outputAttrs: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] = outputAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs.drop(left.output.size))

  private def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"missing column $name in ${side.output.map(_.name)}"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(attr(left, key))) ::
      ClusteredDistribution(Seq(attr(right, key))) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attr(left, key), Ascending), SortOrder(attr(left, time), Ascending)),
    Seq(SortOrder(attr(right, key), Ascending), SortOrder(attr(right, time), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = lOut.indexWhere(_.name == key)
    val lTimeIdx = lOut.indexWhere(_.name == time)
    val rKeyIdx = rOut.indexWhere(_.name == key)
    val rTimeIdx = rOut.indexWhere(_.name == time)
    // projection exprs: left columns verbatim + the right asof columns.
    // The right half of the input schema is forced nullable — binding
    // takes nullability from the input schema, and the no-match case
    // feeds an all-null right row
    val projExprs = lOut ++ asofCols.map(c => attr(right, c).withNullability(true))
    val inputSchema = lOut ++ rOut.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(projExprs, inputSchema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      lIter.map { l =>
        val lk = l.getLong(lKeyIdx)
        val lt = l.getLong(lTimeIdx)
        var advance = true
        while (advance && rHead != null) {
          val rk = rHead.getLong(rKeyIdx)
          if (rk < lk || (rk == lk && rHead.getLong(rTimeIdx) <= lt)) {
            if (rk == lk) { lastMatch = rHead.copy(); lastMatchKey = rk }
            rHead = if (rIter.hasNext) rIter.next() else null
          } else advance = false
        }
        val r = if (lastMatch != null && lastMatchKey == lk) lastMatch else nullRight
        proj(joined(l, r))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
