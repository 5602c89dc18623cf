package graft.validate

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality counters via Spark's Observation API: metrics
  * (row counts, per-column null counts, min/max of a key) are collected
  * DURING the action that materializes the frame — no second scan, no
  * extra job. At 100 TB this is the difference between "audit the load"
  * and "read the corpus twice": the counters ride the same pass that
  * writes the sink.
  *
  * Usage: `val (df, obs) = Observe.counters(in, "load", Seq("a","b"))`,
  * run the action (write/count), then `obs.get` blocks until the metrics
  * arrive. Counters compose with the [[Validator]] gates: a caller can
  * assert null budgets post-action without re-scanning.
  */
object Observe {

  /** Attach row/null counters for `cols` to the frame. Returns the
    * instrumented frame (semantically identical) and the observation
    * handle; read `obs.get` AFTER an action has run. */
  def counters(df: DataFrame, name: String,
               cols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Null-budget check on observed metrics: fails fast if any counted
    * column's null fraction exceeds `maxNullFraction`. Call after the
    * action. */
  def requireNullBudget(obs: Observation, cols: Seq[String],
                        maxNullFraction: Double): Unit = {
    val m = obs.get
    val n = m("n_rows").asInstanceOf[Long]
    if (n > 0) cols.foreach { c =>
      val nulls = m(s"n_null_$c").asInstanceOf[Long]
      require(nulls.toDouble / n <= maxNullFraction,
        s"null budget exceeded on '$c': $nulls/$n > $maxNullFraction")
    }
  }
}
