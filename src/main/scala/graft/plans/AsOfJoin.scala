package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Native as-of join (SURVEY §2c, preference order (c)): for every left row,
  * attach the most recent right row of the same key with rightTs <= leftTs.
  *
  * Spark has no as-of operator; the built-in routes are either a union +
  * last-ignoreNulls window (TimeSeries.asofJoin — an extra union and a wide
  * carried-forward projection) or an inequality join (nested loop). This
  * stack — LogicalPlan + Strategy + BinaryExecNode — executes it as a single
  * streaming merge per co-partitioned, co-sorted key partition: one shuffle
  * per side, O(n) merge, no buffering beyond one carried row.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    carry: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ carry.map(_.withNullability(true))

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    carry: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carry.map(_.withNullability(true))

  // same contract as SortMergeJoin: both sides clustered on the key...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // ...and sorted by (key, ts) within partitions
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = ColumnBridge.orderingFor(leftKey.dataType)
    val tsOrd = ColumnBridge.orderingFor(leftTs.dataType)
    val carryAttrs = carry
    val rightOutput = right.output
    val thisOutput = output
    val leftOutput = left.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val carryProj = UnsafeProjection.create(carryAttrs, rightOutput)
      // bind against carry-as-nullable: the null-carry row must be READ as
      // null, which a non-nullable bound reference would skip checking
      val resultProj = UnsafeProjection.create(thisOutput,
        leftOutput ++ carryAttrs.map(_.withNullability(true)))
      val nullCarry = new GenericInternalRow(carryAttrs.length)
      val joined = new JoinedRow

      // values evaluated off iterator rows may be backed by reused buffers
      // (UnsafeRow sort output) — copy anything we hold across next() calls
      def copyVal(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case r: InternalRow => r.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case x => x
      }

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private var matchKey: Any = null
        private var hasMatch = false
        private var matchRow: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lk = lKeyB.eval(lRow)
          val lt = lTsB.eval(lRow)
          if (lk == null || lt == null) {
            // null key/ts never matches (inequality with NULL is false);
            // null keys sort first, so nothing on the right is consumed early
            return resultProj(joined(lRow, nullCarry))
          }
          // advance the right side through every row at or before (lk, lt)
          // lk is fixed for this whole left row: copy it at most ONCE (a
          // string key clones bytes), not once per consumed right row
          var lkCopied = false
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = rTsB.eval(head) // evaluated once per right row
            if (rk == null || rt == null) {
              rBuf.next() // unmatched by definition; discard
            } else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0 || (cmp == 0 && tsOrd.compare(rt, lt) <= 0)) {
                if (cmp == 0) {
                  if (!lkCopied) { matchKey = copyVal(lk); lkCopied = true }
                  hasMatch = true
                  matchRow = carryProj(head).copy()
                }
                rBuf.next()
              } else {
                advancing = false
              }
            }
          }
          val useMatch = hasMatch && keyOrd.compare(matchKey, lk) == 0
          resultProj(joined(lRow, if (useMatch) matchRow else nullCarry))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, carry) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, carry) :: Nil
    case _ => Nil
  }
}

/** Public API for the native as-of join. */
object AsOf {
  /** left ⟕asof right on `key`, rightTs <= leftTs, carrying `carry` columns
    * from the right (null when no qualifying right row exists).
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
           carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    // self-register on sessions built without GraftExtensions. The
    // append is a read-modify-write on a plain var, and Bench warms 16
    // queries concurrently — synchronize on the experimental holder so
    // two concurrent registrations can't lose one. (A GraftExtensions
    // session registers via injectPlannerStrategy, invisible here, so a
    // harmless duplicate appears there; the strategy returns Nil for
    // every non-AsOf plan.)
    val exp = left.sparkSession.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(AsOfJoinStrategy)) {
        exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
      }
    }
    // Re-alias every right column: left and right often derive from the same
    // base relation and then share expression IDs; the analyzer would
    // deduplicate the right subtree underneath us, orphaning this node's
    // rightKey/rightTs references. Fresh aliases give the right side stable,
    // unique IDs of its own.
    val rightAliased = right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightAliased.queryExecution.analyzed
    // resolve with Spark's own resolver (case-insensitive by default) and
    // REFUSE ambiguity: a plan carrying two columns of the same name
    // (common after joins) must fail like Spark's analyzer would, not
    // silently bind the first and as-of join on the wrong column
    val resolver = left.sparkSession.sessionState.conf.resolver
    def attr(plan: LogicalPlan, name: String): Attribute = {
      val matches = plan.output.filter(a => resolver(a.name, name))
      matches match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"column $name is ambiguous: ${many.map(_.name)} — alias the duplicates first")
      }
    }
    val (lk, rk) = (attr(lPlan, key), attr(rPlan, key))
    val (lt, rt) = (attr(lPlan, ts), attr(rPlan, ts))
    // the exec builds key/ts orderings (and hash-partitions both sides) from
    // the LEFT types — a type drift between sides (INT vs BIGINT key) would
    // otherwise surface as an executor ClassCastException, or worse,
    // silently co-partition the sides differently. Fail at plan time.
    require(lk.dataType == rk.dataType,
      s"as-of key type mismatch: left $key is ${lk.dataType}, right is ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of ts type mismatch: left $ts is ${lt.dataType}, right is ${rt.dataType}")
    ColumnBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, carry.map(attr(rPlan, _))))
  }
}
