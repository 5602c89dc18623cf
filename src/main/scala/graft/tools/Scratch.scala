package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway perf probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    System.err.println("==== PIVOT ====")
    System.err.println(graft.ops.Reshape.eventPivot(spark, sf).queryExecution.executedPlan.toString)
    val base = graft.core.Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_name"))
    val hist = base.withColumn("effective_from", lit(java.sql.Date.valueOf("2024-06-01")))
      .withColumn("effective_to", lit(null).cast("date"))
    System.err.println("==== SCD2 ====")
    System.err.println(graft.ops.Scd2.merge(hist, base, Seq("s_suppkey"), Seq("s_name"),
      java.sql.Date.valueOf("2024-06-02")).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
