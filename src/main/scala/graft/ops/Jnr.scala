package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join ("JNR_") operators.
  *
  * All reference joins are equi-joins (SURVEY §2.5). At scale the key moves
  * are: broadcast the dimension side (part/supplier/customer are orders of
  * magnitude smaller than the fact), and keep keys *clean at ingest* instead
  * of `trim()`-wrapping both sides of a join, which blocks pushdown and
  * breaks broadcast key statistics (reference anti-pattern:
  * m_supplier_performance_task.py:99-104).
  */
object Jnr {

  /** Fact ⋈ broadcast dimension (reference: J1 sales⋈products,
    * m_supplier_performance_task.py:81-95). */
  def factDim(fact: DataFrame, dim: DataFrame, keys: Seq[String],
              joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), keys, joinType)

  /** Trim-tolerant equi-join, the reference's padded-key behavior
    * (reference: J2, m_supplier_performance_task.py:99-104). Implemented by
    * normalizing the key on each side *before* the join so the join itself
    * is a plain equi-join on a clean attribute (broadcast/SMJ eligible),
    * not an expression join. */
  def trimJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String, joinType: String = "inner"): DataFrame = {
    val lk = "__trim_" + leftKey
    val l = left.withColumn(lk, trim(col(leftKey)))
    val r = right.withColumn(lk, trim(col(rightKey))).drop(rightKey)
    l.join(r, Seq(lk), joinType).drop(lk)
  }

  /** Rows in `src` whose key is absent from `tgt` — the reference expresses
    * this as outer-join + null filter (reference: Raptor.py:619-624); native
    * left_anti avoids materializing the null side. */
  def antiByKey(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame =
    src.join(tgt, keys, "left_anti")

  /** Keyed semi-join (EXISTS). */
  def semiByKey(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame =
    src.join(tgt, keys, "left_semi")

  /** Flag join: mark rows whose `attr` appears in a (small) flag set,
    * surfacing the flag as the string "true"/"false" like the reference's
    * TOP_PERFORMER (reference: J9, m_customer_sales_report_task.py:226-252).
    * Broadcast + left join + coalesce, not a shuffle.
    */
  def flagJoin(detail: DataFrame, flags: DataFrame, detailAttr: String,
               flagAttr: String, outCol: String): DataFrame = {
    val f = flags.select(col(flagAttr).as(detailAttr))
      .distinct()
      .withColumn(outCol, lit("true"))
    detail.join(broadcast(f), Seq(detailAttr), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("false")))
  }
}
