package graft.connect

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Serving twin of the dated-CSV source (reference: `main.py:160-235`, the
  * v2 date-parameterized endpoints): resolve `{date}/{keyword}_{date}.csv`
  * under a root, read with the declared contract, and emit bounded JSON
  * records — what a thin HTTP layer would return. The HTTP framework
  * itself stays out of the engine (like Airflow, it is deployment, not
  * query processing); this is the data-plane function it would call.
  *
  * The reference's v1 endpoints (no date parameter) are decommissioned in
  * favor of v2 (`main.py:128-156` vs `:160-235`) — only the v2 shape is
  * reproduced. `limit` bounds driver memory (the reference collects the
  * whole file into pandas — unbounded).
  */
object Serve {

  def records(spark: SparkSession, root: String, keyword: String,
              date: java.time.LocalDate, contract: StructType,
              limit: Int = 1000): Seq[String] = {
    val path = Csv.datedPath(s"$root/{date}/${keyword}_{date}.csv", date)
    Csv.read(spark, path, contract).limit(limit)
      .toJSON.collect().toSeq
  }
}
