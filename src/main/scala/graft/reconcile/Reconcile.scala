package graft.reconcile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset reconciliation — the engine's equivalent of the reference's
  * "Raptor" module (reference: Raptor/Raptor.py:491-682 inside
  * ETL_Airflow/jars/raptor-1.2.10-py3-none-any.whl): diff two keyed
  * datasets row-by-row and cell-by-cell.
  *
  * Same observable semantics, different mechanics. The reference serializes
  * every row to one delimiter-joined string, splits it back, and zips the
  * two arrays with a higher-order transform + explode (Raptor.py:559-605) —
  * fragile (delimiter collisions) and codegen-hostile. Here each compared
  * column becomes a struct in a single array literal and one generator does
  * the cell-level explode; no string round-trip, and the pre-explode
  * mismatch filter runs inside whole-stage codegen.
  *
  * Normalization preserved from the reference: every compared column is
  * cast to string and nulls become '' before comparison (Raptor.py:549-558),
  * so 1 vs '1' and NULL vs '' compare equal.
  *
  * Scale: one shuffle per side (the PK join); anti-joins reuse the same
  * exchange under AQE. Cell explode multiplies only *mismatching* rows.
  */
final case class DiffResult(
    /** (pk..., column_name, source_value, target_value) per differing cell. */
    cellMismatches: DataFrame,
    /** Rows whose PK exists only in the source. */
    sourceOnly: DataFrame,
    /** Rows whose PK exists only in the target. */
    targetOnly: DataFrame,
    /** (column_name, mismatch_count) summary. */
    columnSummary: DataFrame,
    /** (metric, count) rows — the reference's reconciliation report
      * header (source/target/common/extra/mismatched row counts,
      * Raptor.py:271-438). */
    rowCounts: DataFrame)

object Reconcile {

  private def normalize(c: Column): Column =
    coalesce(c.cast("string"), lit(""))

  /** Diff `src` vs `tgt` on primary key `pk`. Columns compared = all
    * non-PK columns present on BOTH sides (the reference requires identical
    * schemas; we intersect, which also tolerates added columns). */
  def diff(src: DataFrame, tgt: DataFrame, pk: Seq[String]): DiffResult = {
    val compared = src.columns.filterNot(pk.contains)
      .filter(tgt.columns.contains).toSeq

    val s = src.select((pk.map(col) ++
      compared.map(c => normalize(col(c)).as(s"__s_$c"))): _*)
    val t = tgt.select((pk.map(col) ++
      compared.map(c => normalize(col(c)).as(s"__t_$c"))): _*)

    val joined = s.join(t, pk, "inner")

    // One struct per compared column; keep only rows with any differing
    // cell before exploding (the common all-equal case never explodes).
    val cells = array(compared.map(c =>
      struct(lit(c).as("column_name"),
             col(s"__s_$c").as("source_value"),
             col(s"__t_$c").as("target_value"))): _*)
    val anyDiff = compared.map(c => col(s"__s_$c") =!= col(s"__t_$c"))
      .reduceOption(_ || _).getOrElse(lit(false))

    val mismatches = joined
      .filter(anyDiff)
      .select((pk.map(col) :+ explode(cells).as("cell")): _*)
      .filter(col("cell.source_value") =!= col("cell.target_value"))
      .select((pk.map(col) :+ col("cell.column_name") :+
               col("cell.source_value") :+ col("cell.target_value")): _*)

    val summary = mismatches.groupBy(col("column_name"))
      .agg(count(lit(1)).as("mismatch_count"))

    val sourceOnly = src.join(tgt.select(pk.map(col): _*), pk, "left_anti")
    val targetOnly = tgt.join(src.select(pk.map(col): _*), pk, "left_anti")
    def counted(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("count")).select(lit(label).as("metric"), col("count"))
    val rowCounts =
      counted("source_rows", src)
        .union(counted("target_rows", tgt))
        .union(counted("common_keys", joined))
        .union(counted("source_only", sourceOnly))
        .union(counted("target_only", targetOnly))
        .union(counted("mismatched_rows",
          mismatches.select(pk.map(col): _*).distinct()))

    DiffResult(
      cellMismatches = mismatches,
      sourceOnly = sourceOnly,
      targetOnly = targetOnly,
      columnSummary = summary,
      rowCounts = rowCounts)
  }

  // -------------------------------------- bucketed anti-entropy diff

  /** Merkle-style DIVERGENCE LOCATION between two row sets: bucket every
    * row by its canonical 60-bit hash mod `buckets`, fold each bucket to
    * (count, XOR-of-hashes) on BOTH sides, and keep only buckets whose
    * summaries differ. Two replicas compare `buckets` summary rows —
    * not data — and re-sync only the divergent buckets' rows; this is
    * the drill-down companion of
    * [[graft.validate.Validator.tableChecksums]] (one row per table) and
    * the cheap prefilter in front of [[diff]] (full keyed cell diff,
    * run per divergent bucket only). XOR is commutative/associative, so
    * summaries are identical under any partitioning and row order, and
    * a single-row difference flips exactly one bucket.
    *
    * Scale shape: one map-side-combined hash aggregate per side over
    * 8-byte hashes, a buckets-sized full-outer join, a buckets-sized
    * output. Nothing row-scaled crosses the network after the scan. */
  def bucketDiff(src: DataFrame, tgt: DataFrame, rowCols: Seq[String],
                 buckets: Int = 256): DataFrame = {
    import graft.functions.TextFunctions.hash60
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def summarize(df: DataFrame, side: String): DataFrame =
      df.select(hash60(concat_ws("|",
          rowCols.map(c => col(c).cast("string")): _*)).as("h"))
        .groupBy(pmod(col("h"), lit(buckets.toLong)).as("bucket"))
        .agg(count(lit(1)).as(s"n_$side"),
             expr("bit_xor(h)").as(s"checksum_$side"))
    summarize(src, "src")
      .join(summarize(tgt, "tgt"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"),
        col("checksum_src"), col("checksum_tgt"))
      .filter(col("n_src") =!= col("n_tgt") ||
        not(col("checksum_src") <=> col("checksum_tgt")))
  }

  private val SyncCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
  private val SyncRate = 0.002

  /** Oracle scenario: the target replica silently lost a deterministic
    * ~0.2% of orders (the md5-bucket selection the sampling family
    * uses); [[bucketDiff]] must name exactly the buckets holding a lost
    * row. */
  def bucketDiffQuery(spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame = {
    import graft.core.Tables
    import graft.ops.Sampling
    val o = Tables.orders(spark, dir)
    val lost = Sampling.bucket(col("o_orderkey"), "sync") <
      lit((SyncRate * 10000L).toLong)
    bucketDiff(o, o.filter(!lost), SyncCols)
  }

  val bucketDiffOracle: String = {
    val row = "concat_ws('|', " +
      SyncCols.map(c => s"CAST($c AS VARCHAR)").mkString(", ") + ")"
    val keep = s"CAST(CAST(('0x' || substr(md5('sync:' || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 10000 >= ${(SyncRate * 10000L).toLong}"
    s"""WITH h_src AS (
       |  SELECT CAST(CAST(('0x' || substr(md5($row), 1, 15)) AS UBIGINT) AS BIGINT) AS h
       |  FROM orders),
       |h_tgt AS (
       |  SELECT CAST(CAST(('0x' || substr(md5($row), 1, 15)) AS UBIGINT) AS BIGINT) AS h
       |  FROM orders WHERE $keep),
       |s AS (SELECT h % 256 AS bucket, CAST(count(*) AS BIGINT) AS n_src,
       |             CAST(bit_xor(h) AS BIGINT) AS checksum_src
       |      FROM h_src GROUP BY 1),
       |t AS (SELECT h % 256 AS bucket, CAST(count(*) AS BIGINT) AS n_tgt,
       |             CAST(bit_xor(h) AS BIGINT) AS checksum_tgt
       |      FROM h_tgt GROUP BY 1)
       |SELECT bucket, coalesce(n_src, 0) AS n_src, coalesce(n_tgt, 0) AS n_tgt,
       |       checksum_src, checksum_tgt
       |FROM s FULL OUTER JOIN t USING (bucket)
       |WHERE coalesce(n_src, 0) <> coalesce(n_tgt, 0)
       |   OR checksum_src IS DISTINCT FROM checksum_tgt
       |""".stripMargin
  }
}
