package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, StringTrim}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite `trim(lk) = trim(rk)` equi-joins into plain
  * attribute equi-joins over pre-projected trimmed keys.
  *
  * The reference joins on trim()-wrapped keys to tolerate padded IDs
  * (reference: m_supplier_performance_task.py:99-104). As a join
  * CONDITION the trim runs inside the join operator on every candidate
  * row pair and hides the key from anything that reasons about column
  * equivalence; as a PROJECTION below the join it runs once per input
  * row, the exchange partitions on a plain attribute, and the join
  * condition is a clean attribute comparison. Semantics are identical.
  *
  * Engine code calls [[graft.ops.Jnr.trimJoin]], which already builds the
  * normalized shape; this rule applies the same fix to ad-hoc user
  * queries written the reference's way.
  */
object NormalizeTrimJoins extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, joinType,
        Some(EqualTo(StringTrim(la: AttributeReference, None),
                     StringTrim(ra: AttributeReference, None))), hint)
        if (left.outputSet.contains(la) && right.outputSet.contains(ra)) ||
           (left.outputSet.contains(ra) && right.outputSet.contains(la)) =>
      val (lAttr, rAttr) =
        if (left.outputSet.contains(la)) (la, ra) else (ra, la)
      val lKey = Alias(StringTrim(lAttr, None), "__graft_trim_l")()
      val rKey = Alias(StringTrim(rAttr, None), "__graft_trim_r")()
      val newJoin = Join(
        Project(left.output :+ lKey, left),
        Project(right.output :+ rKey, right),
        joinType,
        Some(EqualTo(lKey.toAttribute, rKey.toAttribute)),
        hint)
      Project(j.output, newJoin)
  }
}

/** Optimizer rule: fuse the HOF dot-product idiom
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)`
  * into the native [[graft.functions.DotProduct]] kernel.
  *
  * The HOF form materializes a 64-element intermediate array per row pair
  * and walks it twice; the kernel is one fused allocation-free loop
  * (~10× at n² similarity volumes). The rewrite targets
  * `DotProduct(hofNulls = true)`, which reproduces zip_with's null
  * semantics exactly (unequal lengths → null, null element → null), so
  * it is value-identical on EVERY input, not just well-formed embeddings
  * — an optimizer rule must never change results.
  */
object FuseDotProduct extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
  import org.apache.spark.sql.types.{ArrayType, DoubleType}

  private def sameVars(args: Seq[Expression], l: Expression, r: Expression): Boolean = {
    def id(e: Expression) = e match {
      case v: NamedLambdaVariable => Some(v.exprId)
      case _ => None
    }
    val expected = args.flatMap(id).toSet
    expected.size == 2 && Set(id(l), id(r)).flatten == expected
  }
  private def isDoubleArray(e: Expression) = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), zipArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _), mergeArgs, _),
          LambdaFunction(finBody: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          sameVars(zipArgs, mx, my) &&        // product of exactly the two lambda vars
          sameVars(mergeArgs, al, ar) &&      // merge is acc + elem (either order)
          finBody.exprId == finArg.exprId =>  // finish is the identity lambda
      graft.functions.DotProduct(a, b, hofNulls = true)
  }
}

/** Session extensions: installs graft's optimizer rules. Native functions
  * register per-session via
  * [[graft.functions.GraftFunctions.ensureRegistered]]; config-driven
  * sessions can instead set
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NormalizeTrimJoins)
    ext.injectOptimizerRule(_ => FuseDotProduct)
  }
}
