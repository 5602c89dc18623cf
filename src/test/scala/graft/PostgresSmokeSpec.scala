package graft

import org.apache.spark.sql.SaveMode
import graft.connect.{Jdbc, JdbcConfig}

/** REAL-POSTGRES smoke — the documented deployment seam (COVERAGE.md
  * S1/K1): the `GraftDialect` Postgres DDL is unit-tested without a
  * server, but the first real deployment should run THIS suite against
  * a live instance. Env-var gated so it cancels (not fails) in the
  * hermetic sandbox:
  *
  * {{{
  * docker run -d --rm -p 5432:5432 -e POSTGRES_PASSWORD=graft postgres:16
  * GRAFT_PG_URL=jdbc:postgresql://localhost:5432/postgres \
  * GRAFT_PG_USER=postgres GRAFT_PG_PASSWORD=graft \
  *   sbt "testOnly graft.PostgresSmokeSpec"
  * }}}
  *
  * Covers the operations the engine actually issues at Postgres: write
  * overwrite/append, partitioned read, query pushdown, schema-ensure
  * (the real `CREATE SCHEMA IF NOT EXISTS`), and the type-mapping
  * round-trip (DECIMAL, DATE, TIMESTAMP, BOOLEAN). */
class PostgresSmokeSpec extends SparkSpec {
  import spark.implicits._

  private def pgCfg: Option[JdbcConfig] =
    sys.env.get("GRAFT_PG_URL").map { url =>
      JdbcConfig(url = url,
        user = sys.env.getOrElse("GRAFT_PG_USER", "postgres"),
        password = sys.env.getOrElse("GRAFT_PG_PASSWORD", ""))
    }

  test("postgres: overwrite + append + partitioned read round-trip") {
    assume(pgCfg.isDefined, "GRAFT_PG_URL not set - smoke skipped")
    val cfg = pgCfg.get
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "payload")
    Jdbc.write(df, cfg, "graft_smoke_wide", SaveMode.Overwrite)
    Jdbc.write(Seq((101L, "tail")).toDF("id", "payload"), cfg,
      "graft_smoke_wide", SaveMode.Append)
    val part = Jdbc.readTable(spark, cfg, "graft_smoke_wide",
      partitionColumn = Some("id"), lowerBound = 1, upperBound = 102,
      numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 101)
  }

  test("postgres: schema-ensure creates and is idempotent") {
    assume(pgCfg.isDefined, "GRAFT_PG_URL not set - smoke skipped")
    val cfg = pgCfg.get
    val df = Seq((1L, "a")).toDF("id", "s")
    Jdbc.write(df, cfg, "graft_smoke_layer.t1", SaveMode.Overwrite,
      ensureSchema = true)
    Jdbc.write(df, cfg, "graft_smoke_layer.t1", SaveMode.Overwrite,
      ensureSchema = true) // second run: existing schema is a no-op
    assert(Jdbc.readTable(spark, cfg, "graft_smoke_layer.t1").count() == 1)
  }

  test("postgres: decimal/date/timestamp/boolean survive the dialect") {
    assume(pgCfg.isDefined, "GRAFT_PG_URL not set - smoke skipped")
    val cfg = pgCfg.get
    val df = Seq((
      BigDecimal("12345.678901"),
      java.sql.Date.valueOf("2024-06-01"),
      java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789"),
      true)).toDF("dec", "d", "ts", "flag")
    Jdbc.write(df, cfg, "graft_smoke_types", SaveMode.Overwrite)
    val back = Jdbc.readTable(spark, cfg, "graft_smoke_types").collect()(0)
    assert(back.getAs[java.math.BigDecimal]("dec")
      .compareTo(new java.math.BigDecimal("12345.678901")) == 0)
    assert(back.getAs[java.sql.Date]("d").toString == "2024-06-01")
    assert(back.getAs[java.sql.Timestamp]("ts").toString
      .startsWith("2024-06-01 12:34:56.789"))
    assert(back.getAs[Boolean]("flag"))
  }

  test("postgres: query pushdown returns the subquery result") {
    assume(pgCfg.isDefined, "GRAFT_PG_URL not set - smoke skipped")
    val cfg = pgCfg.get
    val df = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)).toDF("id", "v")
    Jdbc.write(df, cfg, "graft_smoke_vals", SaveMode.Overwrite)
    val q = Jdbc.readQuery(spark, cfg,
      """SELECT "id", "v" FROM graft_smoke_vals WHERE "v" > 10""")
    assert(q.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }
}
