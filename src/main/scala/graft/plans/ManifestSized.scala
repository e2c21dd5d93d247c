package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Statistics, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Stats-into-CBO for index-served relations (the `q_table_stats_bhj`
  * pattern extended to the retrieval TVFs): a pass-through logical
  * node whose ONLY job is to advertise a size/row bound derived from
  * the index MANIFEST instead of the size-only estimate Catalyst
  * propagates up from the underlying postings/list scans.
  *
  * Why it matters: a search's OUTPUT is bounded by manifest totals
  * (`searchAll` ≤ live n_docs rows; an ANN top-k is exactly
  * probes × k rows) — bounds the planner cannot see, because the
  * size-only visitor scales the leaf bytes through the aggregates and
  * lands orders of magnitude high. A TVF leg joined to a fact table
  * then sort-merge-shuffles the fact side where the manifest already
  * proves the leg broadcast-sized. With the bound advertised, plain
  * `JoinSelection` picks the broadcast hash join on its own — no
  * hint, no ANALYZE, cold session.
  *
  * The node is resolved (output = child output), survives
  * optimization untouched (no rule matches it), and plans to its
  * child's physical plan via [[ManifestSizedStrategy]] — zero
  * execution footprint.
  */
case class ManifestSized(child: LogicalPlan, sizeBytes: BigInt,
    rowBound: BigInt) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override def stats: Statistics =
    Statistics(sizeInBytes = sizeBytes.max(1), rowCount = Some(rowBound.max(0)))
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object ManifestSized {
  /** EstimationUtils' output-size convention: 8 bytes row overhead
    * plus each attribute's type default size.
    */
  def rowWidth(output: Seq[Attribute]): Long =
    8L + output.map(_.dataType.defaultSize.toLong).sum

  def bounded(plan: LogicalPlan, rowBound: Long): ManifestSized =
    ManifestSized(plan, BigInt(rowBound.max(0L)) * rowWidth(plan.output),
      BigInt(rowBound.max(0L)))
}

/** Plans [[ManifestSized]] as its child — the node exists only for
  * its statistics.
  */
object ManifestSizedStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ManifestSized(child, _, _) => planLater(child) :: Nil
    case _ => Nil
  }
}
