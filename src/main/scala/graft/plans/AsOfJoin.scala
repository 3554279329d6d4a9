package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The engine's whole-operator extension-stack demo, per the build brief's
  * preference order (c): a custom LogicalPlan + SparkStrategy + SparkPlan
  * for the AS-OF join — the canonical operator Spark lacks natively.
  *
  * Semantics (left as-of): for every left row, attach the right row with
  * the same key and the LARGEST right ts <= left ts; no such row → right
  * side NULL. Identical to `ops/Relational.asofJoin`'s window composition
  * (and DuckDB's ASOF LEFT JOIN) — j09 and j13 share one oracle shape.
  *
  * Why a physical operator at 100 TB: the window composition unions both
  * inputs and runs ONE window over the combined (key, ts) sort, carrying
  * every left row through the union shuffle twice (once in, once out).
  * This exec instead asks Catalyst for the classic sort-merge layout —
  * each side hash-clustered by its own key and sorted (key, ts) — and
  * then streams BOTH sorted partitions through one merge scan holding
  * O(1) state (the current candidate row), emitting exactly one output
  * row per left row. No union, no window buffer, no per-key state growth;
  * skew in right-rows-per-key costs sequential scanning, never memory.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, leftTs: Expression,
                        rightKey: Expression, rightTs: Expression)
    extends BinaryNode {
  // right side nullable: unmatched left rows emit NULLs there
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one case, injected via
  * `SparkSessionExtensions.injectPlannerStrategy` ([[graft.GraftExtensions]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Merge-scan exec. Declaring the distribution/ordering requirements is
  * the whole scale story: EnsureRequirements inserts compatible hash
  * exchanges + sorts (exactly as for SortMergeJoin), and the operator
  * itself is a single forward pass over co-partitioned sorted iterators.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, leftTs: Expression,
                        rightKey: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val project = UnsafeProjection.create(outAttrs, outAttrs)
        val nullRight = new GenericInternalRow(rightWidth)
        val joined = new JoinedRow
        val rBuf = rIter.buffered
        // candidate = last right row consumed whose (key, ts) <= the
        // current left (key, ts); reset when the left key moves past it
        var cand: InternalRow = null
        var candKey: Any = null

        lIter.map { l =>
          val key = lk.eval(l)
          val ts = lt.eval(l)
          // null key/ts never matches (SQL comparison semantics)
          if (key == null || ts == null) {
            project(joined(l, nullRight))
          } else {
            // consume right rows up to and including (key, ts); the last
            // same-key one seen is the as-of match (right sorted by ts)
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rKeyV = rk.eval(rBuf.head)
              val cmp = if (rKeyV == null) -1 else keyOrd.compare(rKeyV, key)
              if (cmp < 0) { rBuf.next() } // behind: discard (also null keys)
              else if (cmp == 0) {
                val rTsV = rt.eval(rBuf.head)
                if (rTsV != null && tsOrd.compare(rTsV, ts) <= 0) {
                  cand = rBuf.next().copy() // iterator reuses rows
                  candKey = rKeyV
                } else if (rTsV == null) { rBuf.next() }
                else advancing = false
              } else advancing = false
            }
            if (cand != null && keyOrd.compare(candKey, key) == 0)
              project(joined(l, cand))
            else
              project(joined(l, nullRight))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** DataFrame-level entry: left as-of join on a shared key/ts column
    * pair. Right-side columns are re-aliased with fresh expression ids
    * (the two inputs may share lineage — e.g. two filters of one events
    * table — and a custom node gets no analyzer dedup help), and
    * non-key right columns are prefixed `asof_` to avoid name collisions
    * in the caller's select.
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String,
           tsCol: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map { a =>
      val name = if (a.name == keyCol || a.name == tsCol) s"asof_${a.name}"
                 else if (left.columns.contains(a.name)) s"asof_${a.name}"
                 else a.name
      Alias(a, name)()
    }, rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    GraftPlanBuilder.ofPlan(left.sparkSession,
      AsOfJoinPlan(lp, rp,
        attr(lp, keyCol), attr(lp, tsCol),
        attr(rp, s"asof_$keyCol"), attr(rp, s"asof_$tsCol")))
  }
}
