package graft.tools

import org.apache.spark.sql.functions._

/** Stage-timing probe for partPageRank; data dir comes from the CLI
  * (defaults to the local sf0.1 snapshot). */
object PrExplain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(label + "=" + (System.nanoTime() - t0) / 1e9); r
    }
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).persist()
    time("li_count")(li.count())
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
    time("edges_count")(println("edges=" + edges.count()))
    val full = graft.ops.Graph.partPageRank(spark, dir)
    time("full")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
