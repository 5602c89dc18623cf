package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.reconcile.Reconcile
import graft.schema.SchemaOps
import graft.validate.Validator

/** Oracle-checked query entries for the validation / reconciliation /
  * schema modules (SURVEY §2.11, §1.4): each builds a deterministic
  * scenario from the corpus tables and runs the real operator, so the
  * driver's DuckDB gate exercises the operator end to end.
  */
object EngineQueries {

  /** Reconcile.diff over a deterministically perturbed copy of part:
    * 1-in-50 rows get a renamed p_name (cell mismatch), 1-in-97 rows are
    * dropped from the target (source-only extras are exercised in specs;
    * this query returns the cell-level mismatches). String perturbation
    * only — no float-to-string formatting drift between engines. */
  def reconcileDiff(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    val tgt = src
      .filter(col("p_partkey") % 97 =!= 0)
      .withColumn("p_name",
        when(col("p_partkey") % 50 === 0, concat(col("p_name"), lit("_x")))
          .otherwise(col("p_name")))
    Reconcile.diff(src, tgt, Seq("p_partkey")).cellMismatches
  }

  val reconcileDiffOracle: String =
    """SELECT p_partkey, 'p_name' AS column_name,
      |       p_name AS source_value,
      |       p_name || '_x' AS target_value
      |FROM part
      |WHERE p_partkey % 50 = 0 AND p_partkey % 97 <> 0
      |""".stripMargin

  /** Validator.duplicateKeys over a corpus slice with injected duplicates:
    * every lineitem with linenumber 1 and orderkey % 10 = 0 appears twice. */
  def validateDups(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"))
    val dupes = li.filter(col("l_linenumber") === 1 && col("l_orderkey") % 10 === 0)
    Validator.duplicateKeys(li.union(dupes), Seq("l_orderkey", "l_linenumber"))
  }

  val validateDupsOracle: String =
    """WITH u AS (
      |  SELECT l_orderkey, l_linenumber FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber FROM lineitem
      |  WHERE l_linenumber = 1 AND l_orderkey % 10 = 0)
      |SELECT l_orderkey, l_linenumber, CAST(count(*) AS BIGINT) AS dup_count
      |FROM u GROUP BY 1, 2 HAVING count(*) > 1
      |""".stripMargin

  /** Set operations (SURVEY §2.9 — absent from the reference, present in
    * the engine): customers who placed an order EXCEPT those with any
    * cancelled-status order, INTERSECTed with high-balance customers.
    * Distributed as hash-partitioned distinct/anti under the hood. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val withOrder = orders.select(col("o_custkey").as("c_custkey")).distinct()
    val withCancelled = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey")).distinct()
    val highBalance = cust.filter(col("c_acctbal") > 0)
      .select(col("c_custkey"))
    withOrder.except(withCancelled).intersect(highBalance)
  }

  // INTERSECT binds tighter than EXCEPT in SQL — parenthesize to match
  // the Spark (A except B) intersect C shape
  val setOpsOracle: String =
    """SELECT c_custkey FROM (
      |  SELECT DISTINCT o_custkey AS c_custkey FROM orders
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 0
      |""".stripMargin

  /** SchemaOps.conformByName against a drifted source: columns arrive
    * differently named/cased, one contract column is missing (typed null),
    * extra source columns are dropped, and types are cast. The conformance
    * runs with a DECIMAL(12,2) contract; the oracle-facing output re-casts
    * that column to double because decimal columns round-trip through the
    * driver's two readers (pyarrow vs DuckDB) with different value
    * representations and hash-mismatch even when bit-identical. */
  def schemaConform(spark: SparkSession, dir: String): DataFrame = {
    val drifted = Tables.supplier(spark, dir).select(
      col("s_suppkey").as(" s suppkey "),    // needs trim + underscore
      col("s_name").as("S_Name"),            // needs case normalization
      col("s_acctbal").as("s_acctbal"),      // needs a cast
      col("s_nationkey"))                    // extra: must be dropped
    val contract = StructType(Seq(
      StructField("S_SUPPKEY", LongType),
      StructField("S_NAME", StringType),
      StructField("S_ACCTBAL", DecimalType(12, 2)),
      StructField("S_REGION", StringType))) // missing: typed null
    SchemaOps.conformByName(drifted, contract)
      .withColumn("S_ACCTBAL", col("S_ACCTBAL").cast("double"))
  }

  val schemaConformOracle: String =
    """SELECT s_suppkey AS S_SUPPKEY,
      |       s_name AS S_NAME,
      |       CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS S_ACCTBAL,
      |       CAST(NULL AS VARCHAR) AS S_REGION
      |FROM supplier
      |""".stripMargin
}
