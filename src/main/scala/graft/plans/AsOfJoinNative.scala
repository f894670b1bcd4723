package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col

/** Tier-(c) custom operator (SURVEY §7.2 / builder spec): whole-operator
  * as-of join as LogicalPlan + Strategy + SparkPlan, complementing the
  * compositional [[graft.operators.AsOfJoin]] (tier a). The two agree
  * row-for-row (AsOfJoinParitySpec); the native exec exists to (1) prove
  * out the full extension mechanism and (2) avoid the window operator's
  * carried-payload materialization — the merge walk keeps ONE buffered
  * right row instead of a last_value state column.
  *
  * Semantics: left-outer point-in-time — for each left row the latest
  * right row with the same key and right.ts <= left.ts (ties included),
  * null right columns when no match.
  *
  * Planning: the API pre-repartitions both sides by key with an identical
  * partition count, so the exec only *requires ordering* (key asc, ts
  * asc) — EnsureRequirements inserts the per-partition sorts and
  * zipPartitions pairs co-partitioned data. One shuffle per side, one
  * sort per side: the sort-merge shape.
  */
/** Columns are carried BY NAME, not as Attribute refs: the optimizer's
  * DeduplicateRelations re-aliases exprIds when both sides share a source
  * (self-as-of), which would orphan captured Attributes. Name resolution
  * against the current child output is re-done at planning time. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    keyName: String, leftTsName: String, rightTsName: String) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override lazy val resolved: Boolean = childrenResolved &&
    left.output.exists(_.name == keyName) && right.output.exists(_.name == keyName) &&
    left.output.exists(_.name == leftTsName) && right.output.exists(_.name == rightTsName)
  // name-based columns are invisible to the optimizer unless declared:
  // without this, ColumnPruning strips the key/ts columns from children
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => a.name == keyName || a.name == leftTsName) ++
      right.output.filter(a => a.name == keyName || a.name == rightTsName))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, key, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), key, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    keyName: String, leftTsName: String, rightTsName: String) extends BinaryExecNode {

  private def attrOf(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"$name missing from ${side.output}"))
  private def leftKey: Attribute = attrOf(left, keyName)
  private def rightKey: Attribute = attrOf(right, keyName)
  private def leftTs: Attribute = attrOf(left, leftTsName)
  private def rightTs: Attribute = attrOf(right, rightTsName)

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides sorted by (key, ts) within their (pre-co-partitioned) partitions
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference[Expression](leftKey, left.output)
    val lTsB = BindReferences.bindReference[Expression](leftTs, left.output)
    val rKeyB = BindReferences.bindReference[Expression](rightKey, right.output)
    val rTsB = BindReferences.bindReference[Expression](rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.size
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
      val rBuf = rIter.buffered

      var matchKey: Any = null
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lts = lTsB.eval(lRow)
        // null key/ts never match (SQL equality semantics) — emit the
        // null-extended row without touching the right cursor. Sorted-asc
        // nulls come first on both sides, so not advancing is safe.
        if (lk == null || lts == null) {
          proj(joined(lRow, nullRight))
        } else {
          // advance right while its (key, ts) <= (lk, lts)
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            if (rk == null) { rBuf.next() } // null-key right rows match nothing
            else {
              val c = keyOrd.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
              if (c < 0) { rBuf.next() } // behind: skip (its matches are past)
              else if (c == 0) {
                val rts = rTsB.eval(head)
                if (rts == null) { rBuf.next() } // null-ts rows match nothing
                else if (tsOrd.compare(rts.asInstanceOf[AnyRef], lts.asInstanceOf[AnyRef]) <= 0) {
                  matchRow = rBuf.next().copy() // buffered rows are reused; copy
                  // re-evaluate the key from the COPIED row: evaluating from
                  // the iterator's row would retain a UTF8String (or other
                  // buffer-backed value) pointing into memory the sorter
                  // reuses as it advances — silently mutating the kept key
                  matchKey = rKeyB.eval(matchRow)
                } else continue = false
              } else continue = false
            }
          }
          val useMatch = matchRow != null && matchKey != null &&
            keyOrd.compare(matchKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) == 0
          proj(joined(lRow, if (useMatch) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNative {

  /** Install the strategy on the session (idempotent; also installable at
    * session build time via `.withExtensions(new GraftExtensions)`). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfJoinStrategy.type]))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Left-outer as-of join via the native operator. Both sides are
    * co-partitioned by key here (same partition count) so the exec's
    * zipPartitions pairing is sound. */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val l = left.repartition(n, col(keyCol))
    val r = right.repartition(n, col(keyCol))
    val lPlan = l.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    Seq((lPlan, keyCol), (rPlan, keyCol), (lPlan, leftTs), (rPlan, rightTs))
      .foreach { case (p, c) => attr(p, c) } // fail fast on missing columns
    val plan = AsOfJoinPlan(lPlan, rPlan, keyCol, leftTs, rightTs)
    org.apache.spark.sql.graft.DatasetShim.ofRows(spark, plan)
  }
}

/** SparkSessionExtensions entry point for production sessions:
  * SparkSession.builder().withExtensions(new GraftExtensions) — installs
  * the as-of join strategy and the graft_dot_product function without
  * any per-session register() calls. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL row-level DML (UPDATE / DELETE FROM / MERGE INTO) on graftlog
    // relations → the engine's file-pruned ACID commands
    e.injectPostHocResolutionRule(session =>
      graft.sources.GraftDmlResolution(session))
    // operational SQL (DESCRIBE HISTORY/DETAIL, VACUUM, OPTIMIZE,
    // REORG … APPLY (PURGE)) + catalog-table RENAME/DROP COLUMN — a
    // delegating parser, the delta SQL extension's integration shape
    e.injectParser((session, delegate) =>
      new graft.sources.GraftSqlParser(session, delegate))
    e.injectFunction(graft.functions.VectorExpressions.functionDescription)
    // the other custom expressions self-register per session at their
    // operator entry points; a production session built withExtensions
    // additionally gets them at build time
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.SimHash60].getName, "graft_simhash60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SimHash60(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.MinHashSig].getName, "graft_minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.MinHashSig(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_rolling_fingerprint"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.RollingFingerprint].getName, "graft_rolling_fingerprint"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.RollingFingerprint(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())))
  }
}
