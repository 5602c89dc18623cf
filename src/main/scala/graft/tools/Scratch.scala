package graft.tools
import org.apache.spark.sql.SparkSession
/** Throwaway perf probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = graft.pipelines.CustomerSalesReport.build(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    System.err.println(plan)
    spark.stop()
  }
}
