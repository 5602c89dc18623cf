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
  * Semantics match the HOF formulation exactly: elements are multiplied
  * and summed IN ARRAY ORDER (same sequential fold the DuckDB oracle
  * performs), so swapping one for the other never changes results — only
  * the plan. Null arrays → null; elements are assumed non-null (embedding
  * vectors), matching `zip_with`'s behavior of propagating element nulls
  * only if present.
  */
case class DotProduct(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
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
  val DotName = "graft_dot"
  val ShingleName = "graft_shingle_hash"
  val SimHashName = "graft_simhash"

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(DotName))) {
      reg.createOrReplaceTempFunction(
        DotName,
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)),
        "built-in")
      reg.createOrReplaceTempFunction(
        ShingleName,
        (exprs: Seq[Expression]) => ShingleHash(exprs(0),
          exprs(1).eval().asInstanceOf[Int]),
        "built-in")
      reg.createOrReplaceTempFunction(
        SimHashName,
        (exprs: Seq[Expression]) => SimHash60(exprs(0)),
        "built-in")
    }
  }
}
