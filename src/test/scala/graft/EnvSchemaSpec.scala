package graft

import graft.core.{EnvSchema, RunDate}
import graft.connect.ParquetWarehouse
import graft.pipelines.Ingestion

/** Environment → physical-schema routing (reference: utils.py:190-211):
  * dev and prod resolve the SAME logical layers to DIFFERENT physical
  * locations, and the warehouse + pipelines thread through it. */
class EnvSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("prod maps identity; everything else maps to dev_ prefixes") {
    val prod = EnvSchema("prod")
    assert(prod.resolve("raw") == "raw" && prod.resolve("legacy") == "legacy")
    for (env <- Seq("dev", "qa", "anything")) {
      val e = EnvSchema(env)
      assert(e.resolve("raw") == "dev_raw")
      assert(e.resolve("legacy") == "dev_legacy")
      assert(!e.isProd)
    }
    assert(prod.qualify("raw", "sales_pre") == "raw.sales_pre")
    assert(EnvSchema("dev").qualify("legacy", "sales") == "dev_legacy.sales")
  }

  test("unknown logical layer fails fast") {
    intercept[IllegalArgumentException](EnvSchema("prod").resolve("gold"))
  }

  test("fromEnv follows the reference's ENV-with-dev-default") {
    assert(EnvSchema.fromEnv(_ => Some("prod")).isProd)
    assert(!EnvSchema.fromEnv(_ => None).isProd)          // absent ⇒ dev
    assert(EnvSchema.fromEnv(_ => Some("staging")).resolve("raw") == "dev_raw")
  }

  test("warehouse routes dev and prod to different physical tables under one root") {
    val root = java.nio.file.Files.createTempDirectory("graft_env_wh").toString
    val df = Seq((1L, "2024-06-01")).toDF("id", "day_dt")
    new ParquetWarehouse(root, EnvSchema("dev")).appendHistory(df, "sales")
    new ParquetWarehouse(root, EnvSchema("prod")).appendHistory(df, "sales")
    assert(new java.io.File(s"$root/dev_legacy/sales").exists())
    assert(new java.io.File(s"$root/legacy/sales").exists())
    // each environment reads back only its own write
    assert(new ParquetWarehouse(root, EnvSchema("dev"))
      .readHistory(spark, "sales").count() == 1)
  }

  test("ingestion materializes through the env-routed warehouse") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_env_ing").toString
    val wh = new ParquetWarehouse(root, EnvSchema("dev"))
    val contract = StructType(Seq(
      StructField("sale_id", LongType), StructField("amount", DoubleType),
      StructField("status", StringType)))
    val day = Seq((1L, 5.0, "OK")).toDF("sale_id", "amount", "status")
    Ingestion.ingest(day, "sales", contract, Seq("SALE_ID"),
      RunDate("2024-06-01"), wh)
    assert(new java.io.File(s"$root/dev_raw/sales_pre").exists())
    assert(new java.io.File(s"$root/dev_legacy/sales").exists())
    assert(!new java.io.File(s"$root/raw").exists()) // nothing leaked to prod
    assert(wh.readHistory(spark, "sales").count() == 1)
  }
}
