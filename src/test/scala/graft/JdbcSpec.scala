package graft

import org.apache.spark.sql.SaveMode
import graft.connect.{Jdbc, JdbcConfig}

/** Real JDBC round-trips against embedded Derby (in-memory, no server):
  * proves S1/S2/K1 with an actual driver, including the partitioned scan
  * the reference never had. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = JdbcConfig(
    url = "jdbc:derby:memory:graftdb;create=true",
    driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))

  test("write overwrite + read table round-trip") {
    val df = Seq((1L, "alice", 10.5), (2L, "bob", 20.25), (3L, "carol", 30.0))
      .toDF("id", "name", "amt")
    Jdbc.write(df, cfg, "people", SaveMode.Overwrite)
    val back = Jdbc.readTable(spark, cfg, "people")
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "name", "amt"))
  }

  test("partitioned read fans out over a numeric column") {
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "payload")
    Jdbc.write(df, cfg, "wide", SaveMode.Overwrite)
    val part = Jdbc.readTable(spark, cfg, "wide",
      partitionColumn = Some("id"), lowerBound = 1, upperBound = 101,
      numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
  }

  test("query pushdown scan returns the subquery result") {
    val df = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)).toDF("id", "v")
    Jdbc.write(df, cfg, "vals", SaveMode.Overwrite)
    // Spark writes quoted (case-sensitive) identifiers to Derby — quote
    // them in hand-written pushdown SQL too
    val q = Jdbc.readQuery(spark, cfg,
      """SELECT "id", "v" FROM vals WHERE "v" > 10""")
    assert(q.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("append mode accumulates") {
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq((2L, "y")).toDF("id", "s")
    Jdbc.write(a, cfg, "acc", SaveMode.Overwrite)
    Jdbc.write(b, cfg, "acc", SaveMode.Append)
    assert(Jdbc.readTable(spark, cfg, "acc").count() == 2)
  }

  test("ensureSchema: write into a not-yet-existing schema succeeds") {
    // reference parity: Raptor.py:41-58 creates the schema before every
    // write so a fresh database works on first run
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    Jdbc.write(df, cfg, "fresh_layer.t1", SaveMode.Overwrite,
      ensureSchema = true)
    assert(Jdbc.readTable(spark, cfg, "fresh_layer.t1").count() == 2)
    // second call: schema already exists, must be a no-op not an error
    Jdbc.ensureSchema(cfg, "fresh_layer")
    Jdbc.write(df, cfg, "fresh_layer.t2", SaveMode.Overwrite,
      ensureSchema = true)
    assert(Jdbc.readTable(spark, cfg, "fresh_layer.t2").count() == 2)
  }

  test("ensureSchema rejects non-identifier schema names") {
    intercept[IllegalArgumentException] {
      Jdbc.ensureSchema(cfg, "bad;DROP TABLE x")
    }
  }
}
