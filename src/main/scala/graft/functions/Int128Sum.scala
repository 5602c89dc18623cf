package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Add, AttributeReference, BitwiseAnd, BitwiseNot, BitwiseOr, Cast,
  EvalMode, Expression, If, IsNull, LessThan, Literal, Multiply,
  ShiftRight, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Exact 128-bit sum of a BIGINT column, accumulated in TWO LONG buffer
  * slots (hi limb, unsigned lo limb) instead of a DECIMAL(38,0) buffer.
  *
  * Why: Spark's decimal `sum` above precision 18 runs every row through
  * `Decimal`/`java.math.BigDecimal` — an object allocation and scaled
  * BigInteger add per row per aggregate. The exact-moments queries
  * (corr matrix, ACF, moment/variance passes) carry a dozen such sums
  * whose INPUTS are integer-grid longs: profiling q_corr_matrix showed
  * ~95% of its steady-state cost was exactly this decimal accumulation
  * (the 600k-row moments pass ran ~5 s; the long arithmetic itself is
  * milliseconds). This aggregate keeps the per-row work at three
  * wrapping long adds and a handful of bitwise ops — zero allocation,
  * fully inside whole-stage codegen — and converts to DECIMAL(38,0)
  * once per GROUP at evaluate.
  *
  * Built ENTIRELY from stock codegen'd expressions: legacy-eval-mode
  * `Add` (wrapping two's-complement — the limb arithmetic), the
  * bitwise majority-carry formula `((a&b) | ((a|b) & ~(a+b))) >>> 63`,
  * and an arithmetic shift for the input's sign extension. No custom
  * eval, no codegen fallback, ANSI-safe (the wrap is confined to the
  * limb adds, where it is the semantics).
  *
  * Contract (the exact-sum discipline's domain):
  *  - input is BIGINT; NULL rows contribute 0 and the empty group
  *    returns 0 (not NULL) — the moments callers aggregate non-null
  *    grid values where this matches `coalesce(sum(x), 0)`;
  *  - the TRUE running sum must stay inside 128 signed bits, which
  *    holds for any real corpus: inputs are bounded by the callers'
  *    integer grids (|x| ≤ ~2^47 for the widest moment product), so
  *    overflow needs ≥ 2^80 rows;
  *  - the decimal conversion at evaluate requires |sum| < 10^38
  *    (DECIMAL(38,0)); beyond it ANSI decimal overflow raises rather
  *    than corrupts.
  */
case class Int128Sum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_int128_sum"

  private lazy val hi = AttributeReference("hi128", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo128", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L), Literal(0L))

  /** Wrapping two's-complement add — limb arithmetic, not a value add. */
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Carry out of the unsigned 64-bit add `a + b`: majority(aₘₛᵦ, bₘₛᵦ,
    * ¬sₘₛᵦ) — 0 or 1 as a long, branch-free. */
  private def carry(a: Expression, b: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b),
        BitwiseAnd(BitwiseOr(a, b), BitwiseNot(wadd(a, b)))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), Literal(0L), child)
    Seq(
      // hi += sign-extension of x, plus the lo-limb carry
      wadd(wadd(hi, ShiftRight(x, Literal(63))), carry(lo, x)),
      wadd(lo, x))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    wadd(wadd(hi.left, hi.right), carry(lo.left, lo.right)),
    wadd(lo.left, lo.right))

  /** (hi, lo) → DECIMAL(38,0): the two's-complement value is
    * `(hi + (lo < 0 ? 1 : 0)) · 2⁶⁴ + lo` — folding lo's sign into the
    * hi limb keeps every decimal operand exact at ≤ 20 digits. */
  override lazy val evaluateExpression: Expression = {
    val two64 = Literal(Decimal(BigDecimal(2).pow(64)), DecimalType(20, 0))
    val adjHi = If(LessThan(lo, Literal(0L)), wadd(hi, Literal(1L)), hi)
    Cast(
      Add(Multiply(Cast(adjHi, DecimalType(20, 0)), two64),
          Cast(lo, DecimalType(20, 0))),
      DecimalType(38, 0))
  }

  override protected def withNewChildInternal(newChild: Expression): Int128Sum =
    copy(child = newChild)
}
