package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test corpus (one parquet file per table under an sf dir).
  *
  * These are plain parquet scans — column pruning and predicate pushdown
  * reach the scan automatically because every query builds a declarative
  * plan on top of them (check `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Document ids SPREAD across the cluster, for per-doc codec/fixture
    * kernels: the documents scan is one small parquet split at fixture
    * scales, so a heavy `mapPartitions` downstream would serialize on a
    * single task (measured: the Vorbis near-dup read 6.0 s on one core,
    * 0.96 s spread). The partition count is explicit because AQE
    * coalesces a count-less repartition of a bare-longs shuffle right
    * back to one partition. At warehouse scale the scan has thousands
    * of splits and the shuffle (longs only) is noise — while still
    * rebalancing skewed per-doc payload sizes. */
  def docIds(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    load(spark, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** The events table's `ts` normalizes to a session-tz TIMESTAMP (UTC
    * sessions everywhere) whatever the snapshot's physical type:
    *
    *  - TIMESTAMP(NANOS) parquet (earlier snapshots): Spark cannot
    *    represent nanos (µs max); sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, so `ts` arrives as a
    *    nanos-since-epoch long — truncate to micros exactly like DuckDB's
    *    TIMESTAMP_NS → TIMESTAMP cast does.
    *  - timestamp[us] without a zone (current snapshots): Spark infers
    *    TIMESTAMP_NTZ, which `unix_micros` et al. reject — cast to
    *    TIMESTAMP, which under the UTC session keeps the wall time
    *    identical to DuckDB's naive read.
    *
    * Either way both engines see the same micros-precision instants. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer DIV, not `/`: ns epochs (~1.7e18) overflow double's exact range
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
