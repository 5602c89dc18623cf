package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking ("RNK_") operators.
  *
  * The reference's top-1-per-group uses row_number with NO tiebreaker,
  * making ties nondeterministic (reference:
  * m_supplier_performance_task.py:145-155). Here every ranking takes an
  * explicit deterministic tiebreak column list.
  */
object Rnk {

  /** Keep the top `k` rows per group ordered by `orderBy` (desc) with
    * deterministic tiebreaks. */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[String], orderBy: Column,
                   tiebreak: Seq[Column], k: Int = 1): DataFrame = {
    val w = Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy((orderBy.desc +: tiebreak.map(_.asc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
