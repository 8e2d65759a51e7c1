package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.functions.{col, unix_micros}

/** AS-OF JOIN as a full custom operator — logical node + planner strategy +
  * physical sort-merge exec (SURVEY.md §2.3 R7; the "state of an entity as
  * of time T" primitive behind the reference's time-slider,
  * /root/reference/README.md:17).
  *
  * Semantics: for every left row, attach the single right row with the same
  * key and the greatest right timestamp ≤ the left timestamp (inclusive;
  * `strict = true` uses <, i.e. strictly earlier); null-extended when no
  * such row exists (LEFT as-of). Matches DuckDB's `ASOF LEFT JOIN` with
  * `>=` / `>` — which is exactly what the oracle uses.
  *
  * Why a custom operator (SURVEY §4.3 preference order, step c): the
  * window-function rewrite (union both sides, partition by key, order by
  * time, last-non-null) shuffles LEFT ∪ RIGHT through one window and can't
  * early-advance; the physical exec below declares
  * `requiredChildDistribution/Ordering`, so Catalyst's EnsureRequirements
  * inserts hash exchanges + in-partition sorts EXACTLY like a sort-merge
  * join, and the merge itself is a single forward pass per partition with
  * O(1) state — no buffering, no window frames. At 100 TB this is one
  * shuffle per side (same as any shuffled join) and a streaming merge.
  *
  * Constraint (documented, enforced at construction): key expressions are
  * integral (LongType) and timestamps are TimestampType/LongType — both
  * evaluate to Long, keeping the merge comparator primitive. The engine's
  * graph/event schema (§1.2) uses exactly these types.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTs: Expression, rightTs: Expression,
                    strict: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, strict) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        strict: Boolean) extends BinaryExecNode with CodegenSupport {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  // EnsureRequirements reads these and inserts the exchanges + sorts —
  // the same machinery SortMergeJoinExec relies on.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil,
        SortOrder(rightKey, Ascending) :: SortOrder(rightTs, Ascending) :: Nil)

  // the merge is 1:1 with the left side and preserves its partition layout
  // and in-partition order — declaring both lets Catalyst elide downstream
  // exchanges/sorts that are already satisfied (e.g. a groupBy on the key
  // or a re-sort by (key, ts) after the join)
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      // emit UnsafeRows: operators and collect paths downstream may consume
      // this exec's output DIRECTLY (e.g. when the declared outputOrdering
      // elides their sort), and those paths require the unsafe format — a
      // raw JoinedRow would ClassCastException there
      val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // one candidate per partition pass: the latest right row whose
      // (key, ts) ≤ the current left (key, ts) in lexicographic order
      var candKey = 0L
      var candTs = Long.MinValue
      var cand: InternalRow = null
      lIter.map { lRow =>
        val lk = lkB.eval(lRow)
        val lt = ltB.eval(lRow)
        if (lk == null || lt == null) toUnsafe(joined(lRow, nullRight))
        else {
          val lKey = lk.asInstanceOf[Long]
          val lTs = lt.asInstanceOf[Long]
          // advance the right side up to and including (lKey, lTs)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val hk = rkB.eval(rBuf.head)
            val ht = rtB.eval(rBuf.head)
            if (hk == null || ht == null) rBuf.next() // null keys never match
            else {
              val k = hk.asInstanceOf[Long]; val t = ht.asInstanceOf[Long]
              if (k < lKey || (k == lKey && (if (strict) t < lTs else t <= lTs))) {
                candKey = k; candTs = t; cand = rBuf.next().copy()
              } else advancing = false
            }
          }
          if (cand != null && candKey == lKey &&
              (if (strict) candTs < lTs else candTs <= lTs)) toUnsafe(joined(lRow, cand))
          else toUnsafe(joined(lRow, nullRight))
        }
      }
    }
  }

  // ---------------- whole-stage codegen (SURVEY §9.3) ----------------
  // SortMergeJoinExec's protocol: this exec is the stage's input boundary —
  // inputRDDs() hands both sorted children to WholeStageCodegenExec (the
  // framework zips up to 2), and doProduce emits the merge loop directly,
  // fusing the advance + match + downstream consume into one compiled loop
  // (no per-row eval() virtual calls, no JoinedRow allocation).

  override def inputRDDs(): Seq[RDD[InternalRow]] = left.execute() :: right.execute() :: Nil

  // output rows are assembled from a mutable candidate row; downstream
  // buffering operators must copy (same reason SortMergeJoinExec sets this)
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    // lookahead right row not yet consumed, and the current best candidate
    val rightHead = ctx.addMutableState("InternalRow", "asofRightHead")
    val cand = ctx.addMutableState("InternalRow", "asofCand")
    val candKey = ctx.addMutableState("long", "asofCandKey")
    val candTs = ctx.addMutableState("long", "asofCandTs")
    val candValid = ctx.addMutableState("boolean", "asofCandValid")

    val leftRow = ctx.freshName("asofLeftRow")
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val lkCode = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val ltCode = BindReferences.bindReference(leftTs, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    ctx.INPUT_ROW = rightHead
    val rkCode = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rtCode = BindReferences.bindReference(rightTs, right.output).genCode(ctx)

    val matched = ctx.freshName("asofMatched")
    // candidate-side columns: evaluated from the saved candidate row only
    // when matched, null-extended otherwise (LEFT as-of contract)
    ctx.INPUT_ROW = cand
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val raw = BoundReference(i, a.dataType, nullable = true).genCode(ctx)
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      ExprCode(
        code"""
          |boolean $isNull = true;
          |$jt $value = ${CodeGenerator.defaultValue(a.dataType)};
          |if ($matched) {
          |  ${raw.code}
          |  $isNull = ${raw.isNull};
          |  $value = ${raw.value};
          |}
        """.stripMargin,
        JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }

    val lKey = ctx.freshName("asofLeftKey")
    val lTs = ctx.freshName("asofLeftTs")
    val rk = ctx.freshName("asofRightKey")
    val rt = ctx.freshName("asofRightTs")
    val advancing = ctx.freshName("asofAdvancing")
    val cmp = if (strict) "<" else "<="

    // limitNotReachedCond (SortMergeJoinExec's pattern): when a LIMIT is
    // fused into this codegen stage, stop the merge as soon as it's hit
    // instead of draining the whole left partition.
    s"""
       |while ($limitNotReachedCond $leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lkCode.code}
       |  ${ltCode.code}
       |  boolean $matched = false;
       |  if (!(${lkCode.isNull}) && !(${ltCode.isNull})) {
       |    long $lKey = ${lkCode.value};
       |    long $lTs = ${ltCode.value};
       |    boolean $advancing = true;
       |    while ($advancing) {
       |      if ($rightHead == null) {
       |        if ($rightInput.hasNext()) { $rightHead = (InternalRow) $rightInput.next(); }
       |        else break;
       |      }
       |      ${rkCode.code}
       |      ${rtCode.code}
       |      if (${rkCode.isNull} || ${rtCode.isNull}) { $rightHead = null; continue; }
       |      long $rk = ${rkCode.value};
       |      long $rt = ${rtCode.value};
       |      if ($rk < $lKey || ($rk == $lKey && $rt $cmp $lTs)) {
       |        $candKey = $rk; $candTs = $rt;
       |        $cand = $rightHead.copy(); $candValid = true;
       |        $rightHead = null;
       |      } else {
       |        $advancing = false;
       |      }
       |    }
       |    $matched = $candValid && $candKey == $lKey && $candTs $cmp $lTs;
       |  }
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.join(left, right, "key", "key2", "ts", "ts2")`. */
object AsOf {
  /** LEFT as-of join; see [[AsOfJoin]] for semantics. Both inputs pass
    * through a fresh-alias projection so expression ids stay disjoint even
    * for self-as-of joins; key/ts attributes are taken RESOLVED from the
    * analyzed child plans, so the custom node enters the analyzer already
    * resolved. Keys must be LongType; timestamps TimestampType or LongType
    * (both evaluate to primitive longs — the merge comparator stays
    * unboxed).
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           strict: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    def freshen(df: DataFrame): DataFrame =
      df.select(df.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val lp = freshen(left).queryExecution.analyzed
    val rp = freshen(right).queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lts, rts) = (attr(lp, leftTs), attr(rp, rightTs))
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    Seq(lk, rk).foreach(e => require(e.dataType == LongType,
      s"as-of key must be LongType, got ${e.dataType}"))
    // all three types evaluate to primitive long micros/values
    Seq(lts, rts).foreach(e => require(
      e.dataType == LongType || e.dataType == TimestampType || e.dataType == TimestampNTZType,
      s"as-of timestamp must be TimestampType/TimestampNTZType/LongType, got ${e.dataType}"))
    GraftPlanBridge.ofRows(spark, AsOfJoin(lp, rp, lk, rk, lts, rts, strict))
  }

  /** LEFT FORWARD as-of join: for every left row, the right row with the
    * same key and the SMALLEST right timestamp ≥ the left timestamp
    * (`strict = true` uses >, i.e. strictly later); null-extended when none
    * exists. "The next event after T" — the mirror image of [[join]].
    * Implemented as [[join]] over NEGATED epoch-micros (forward in an order
    * is backward in its reverse), so the same logical node, exec, and
    * whole-stage codegen serve both directions. Matches DuckDB's
    * `ASOF LEFT JOIN ... ON l.ts <= r.ts` / `<`.
    */
  def joinForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTs: String, rightTs: String,
                  strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    def neg(df: DataFrame, ts: String): org.apache.spark.sql.Column =
      df.schema(ts).dataType match {
        case LongType => -col(ts)
        case TimestampType => -unix_micros(col(ts))
        // NTZ must negate its NAIVE micros with no session-timezone step —
        // a cast through TimestampType would shift by the session offset
        // and make the forward direction disagree with the backward join
        // (which evaluates NTZ natively) outside UTC sessions.
        // timestampdiff over two NTZ values is a pure naive difference.
        case TimestampNTZType =>
          -org.apache.spark.sql.functions.expr(
            s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `$ts`)")
        case dt => throw new IllegalArgumentException(s"unsupported as-of timestamp type $dt")
      }
    val (lNeg, rNeg) = ("__asof_neg_lts", "__asof_neg_rts")
    join(left.withColumn(lNeg, neg(left, leftTs)),
         right.withColumn(rNeg, neg(right, rightTs)),
         leftKey, rightKey, lNeg, rNeg, strict)
      .drop(lNeg, rNeg)
  }
}
