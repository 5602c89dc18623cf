package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime data-quality gates — first-class operators in the reference
  * (SURVEY §2.11).
  */
final class DuplicateException(msg: String) extends RuntimeException(msg)

object Validator {

  /** Keys having more than one row, with their counts. Distributed: one
    * partial+final hash aggregation, no data to the driver beyond the
    * violating keys (reference check: utils.py:136-139 counted on the
    * driver). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Abort (throw) if any key group has >1 row — the reference's gate run
    * before every write (reference: utils.py:108-142; call sites
    * ingestion_task.py:56,117,172,234). Uses `isEmpty`, which stops at the
    * first violating row instead of counting all of them. */
  def requireUnique(df: DataFrame, keys: Seq[String]): Unit = {
    val dups = duplicateKeys(df, keys)
    if (!dups.isEmpty)
      throw new DuplicateException(
        s"duplicate keys on (${keys.mkString(", ")}): " +
          dups.limit(5).collect().mkString("; "))
  }

  /** Reject empty inputs (reference: ingestion_task.py:32-33,91-93,151-153). */
  def requireNonEmpty(df: DataFrame, what: String): Unit =
    if (df.isEmpty) throw new IllegalStateException(s"empty input: $what")
}
