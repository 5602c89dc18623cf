package graft.tools
import org.apache.spark.sql.SparkSession
/** Throwaway perf probe (not part of the library surface). */
object Scratch {
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(graft.core.Tables.lineitem(spark, dir))
    for (i <- 1 to 3) {
      time(s"supplier $i") { noop(graft.pipelines.SupplierPerformance.build(spark, dir)) }
      spark.catalog.clearCache()
      time(s"csr $i") { noop(graft.pipelines.CustomerSalesReport.build(spark, dir)) }
      spark.catalog.clearCache()
      time(s"clusters $i") { noop(graft.ops.Dedup.clusters(spark, dir)) }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
