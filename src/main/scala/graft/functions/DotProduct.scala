package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * allocates an intermediate 64-element array per row pair and walks it a
  * second time — at n² similarity-search scale that is millions of
  * short-lived arrays per task. This expression generates a single fused
  * loop over the two `ArrayData` (`doGenCode`), no allocation, inside
  * whole-stage codegen.
  *
  * Semantics: elements are multiplied and summed IN ARRAY ORDER (the same
  * sequential fold the DuckDB oracle performs), and a null array on either
  * side yields null — identical to the HOF formulation on this kernel's
  * intended domain of equal-length, non-null-element vectors. INTENTIONAL
  * RESTRICTION outside that domain (default `hofNulls = false`): unequal
  * lengths sum over the first min(n) elements (zip_with would pad with
  * null and return NULL), and a null ELEMENT reads as 0.0 via
  * `ArrayData.getDouble` (zip_with would propagate NULL). Embedding
  * columns are fixed-length non-null, and per-element null checks would
  * put a branch in the fused n² inner loop, so the divergence is
  * documented rather than guarded.
  *
  * `hofNulls = true` reproduces the zip_with+aggregate semantics EXACTLY
  * (unequal lengths → null, any null element → null) at the cost of the
  * length test and a per-element null branch — the mode
  * [[graft.plans.FuseDotProduct]] uses so its rewrite is value-identical
  * on every input.
  */
case class DotProduct(left: Expression, right: Expression,
                      hofNulls: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = hofNulls || super.nullable
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (hofNulls && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (hofNulls) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      if (hofNulls)
        s"""
           |if ($x.numElements() != $y.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $x.numElements();
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
           |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
           |      ${ev.isNull} = true;
           |    } else {
           |      $s += $x.getDouble($i) * $y.getDouble($i);
           |    }
           |  }
           |  ${ev.value} = $s;
           |}
         """.stripMargin
      else
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session-local registration of graft's native expressions, so they are
  * callable from any Column context via `call_function` without requiring
  * a `spark.sql.extensions` config at session build time. Idempotent. */
object GraftFunctions {
  /** SQL-facing dot product: `hofNulls = true`, so ad-hoc users get
    * exactly the `aggregate(zip_with(...))` semantics the docs equate it
    * to (null element → null, ragged arrays → null). The null/length
    * checks are negligible outside an n² inner loop. */
  val DotName = "graft_dot"
  /** Unchecked kernel for graft's internal fused n² paths (equal-length,
    * non-null embedding vectors): no length test, no per-element null
    * branch. Diverges from zip_with on ragged/null inputs — internal
    * call sites guarantee the domain. */
  val DotRawName = "graft_dot_raw"
  val ShingleName = "graft_shingle_hash"
  val SimHashName = "graft_simhash"
  val BloomAggName = "graft_bloom_agg"
  val BloomContainsName = "graft_might_contain"
  val NfcName = "graft_nfc"
  val StripAccentsName = "graft_strip_accents"
  /** Exact 128-bit BIGINT sum in two long limbs — the zero-allocation
    * replacement for DECIMAL(38,0) accumulation in the exact-moments
    * passes ([[Int128Sum]]). */
  val Int128SumName = "graft_int128_sum"

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(DotName))) {
      reg.createOrReplaceTempFunction(
        DotName,
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1), hofNulls = true),
        "built-in")
      reg.createOrReplaceTempFunction(
        DotRawName,
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)),
        "built-in")
      reg.createOrReplaceTempFunction(
        ShingleName,
        (exprs: Seq[Expression]) => {
          // the shingle width must be a compile-time constant (it shapes
          // the generated code); accept any foldable integral expression
          // and fail with the expected signature otherwise
          def bad(got: String) = throw new IllegalArgumentException(
            s"$ShingleName(text STRING, k INT) requires a foldable integral" +
              s" literal for k; got $got")
          val k = exprs(1) match {
            case e if e.foldable => e.eval() match {
              case i: Int => i
              case l: Long if l.isValidInt => l.toInt
              case s: Short => s.toInt
              case b: Byte => b.toInt
              case other => bad(s"${e.dataType.simpleString} value $other")
            }
            case e => bad(s"non-foldable ${e.dataType.simpleString}")
          }
          ShingleHash(exprs(0), k)
        },
        "built-in")
      reg.createOrReplaceTempFunction(
        SimHashName,
        (exprs: Seq[Expression]) => SimHash60(exprs(0)),
        "built-in")
      // Spark ships Bloom-filter build/probe expressions for its runtime
      // join filters but does not register them as SQL functions; exposing
      // them gives the engine a broadcastable membership sketch
      // (graft_bloom_agg(x, items, bits) -> binary;
      //  graft_might_contain(bf, x) -> boolean, x LONG)
      reg.createOrReplaceTempFunction(
        BloomAggName,
        (exprs: Seq[Expression]) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
            .toAggregateExpression(),
        "built-in")
      reg.createOrReplaceTempFunction(
        BloomContainsName,
        (exprs: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions
            .BloomFilterMightContain(exprs(0), exprs(1)),
        "built-in")
      reg.createOrReplaceTempFunction(
        NfcName,
        (exprs: Seq[Expression]) => NfcNormalize(exprs(0)),
        "built-in")
      reg.createOrReplaceTempFunction(
        StripAccentsName,
        (exprs: Seq[Expression]) => StripAccents(exprs(0)),
        "built-in")
      reg.createOrReplaceTempFunction(
        Int128SumName,
        (exprs: Seq[Expression]) => Int128Sum(exprs(0)).toAggregateExpression(),
        "built-in")
    }
  }
}
