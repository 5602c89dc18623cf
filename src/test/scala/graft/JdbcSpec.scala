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

  test("type mapping round-trip: decimal, date, timestamp, boolean survive the dialect") {
    // the dialect seam the reference actually exercises on Postgres
    // (money as DECIMAL, DAY_DT as DATE, LOAD_TSTMP as TIMESTAMP):
    // proven here against the Derby dialect — a deployment should run
    // this same case against real Postgres before first use (COVERAGE.md
    // S1 known-seam note)
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "12345.678900", "2024-06-01", "2024-06-01 12:34:56.789", true),
      (2L, "-0.000001", "1999-12-31", "2000-01-01 00:00:00", false))
      .toDF("id", "amt", "d", "ts", "flag")
      .select(col("id"), col("amt").cast("decimal(18,6)").as("amt"),
              col("d").cast("date").as("d"),
              col("ts").cast("timestamp").as("ts"), col("flag"))
    Jdbc.write(df, cfg, "typed", SaveMode.Overwrite)
    val back = Jdbc.readTable(spark, cfg, "typed")
    val byName = back.schema.map(f => f.name.toLowerCase -> f.dataType).toMap
    assert(byName("amt") == org.apache.spark.sql.types.DecimalType(18, 6))
    assert(byName("d") == org.apache.spark.sql.types.DateType)
    assert(byName("ts") == org.apache.spark.sql.types.TimestampType)
    assert(byName("flag") == org.apache.spark.sql.types.BooleanType)
    val row = back.filter(col("id") === 1L).collect()(0)
    assert(row.getAs[java.math.BigDecimal]("amt") ==
      new java.math.BigDecimal("12345.678900"))
    assert(row.getAs[java.sql.Date]("d") == java.sql.Date.valueOf("2024-06-01"))
    assert(row.getAs[java.sql.Timestamp]("ts") ==
      java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789"))
    assert(row.getAs[Boolean]("flag"))
  }

  test("postgres dialect emits the deployment DDL (no server needed)") {
    import org.apache.spark.sql.types._
    import graft.connect.{GraftDialect, PostgresDialect, DerbyDialect}
    // URL dispatch: first deployment is a config change
    assert(GraftDialect.forUrl("jdbc:postgresql://db:5432/raptor") eq PostgresDialect)
    assert(GraftDialect.forUrl("jdbc:derby:memory:x;create=true") eq DerbyDialect)
    // the reference's exact self-heal statement (Raptor.py:41-58)
    assert(PostgresDialect.createSchemaSql("raptor") ==
      "CREATE SCHEMA IF NOT EXISTS raptor")
    assert(DerbyDialect.createSchemaSql("raptor") == "CREATE SCHEMA raptor")
    // DECIMAL / date / timestamp / string / binary mapping divergences
    assert(PostgresDialect.typeDdl(DecimalType(18, 6)) == "NUMERIC(18,6)")
    assert(PostgresDialect.typeDdl(DecimalType(38, 10)) == "NUMERIC(38,10)")
    assert(DerbyDialect.typeDdl(DecimalType(38, 10)) == "DECIMAL(31,10)") // Derby caps at 31
    assert(PostgresDialect.typeDdl(StringType) == "TEXT")
    assert(DerbyDialect.typeDdl(StringType) == "VARCHAR(32672)")
    assert(PostgresDialect.typeDdl(DoubleType) == "DOUBLE PRECISION")
    assert(PostgresDialect.typeDdl(BinaryType) == "BYTEA")
    assert(PostgresDialect.typeDdl(DateType) == "DATE")
    assert(PostgresDialect.typeDdl(TimestampType) == "TIMESTAMP")
    // full CREATE TABLE over a representative mart schema
    val schema = StructType(Seq(
      StructField("day_dt", DateType, nullable = false),
      StructField("customer_name", StringType),
      StructField("total_sales", DecimalType(18, 6)),
      StructField("loaded_at", TimestampType)))
    assert(PostgresDialect.createTableSql("raptor.sales_mart", schema) ==
      "CREATE TABLE \"raptor\".\"sales_mart\" (" +
        "\"day_dt\" DATE NOT NULL, \"customer_name\" TEXT, " +
        "\"total_sales\" NUMERIC(18,6), \"loaded_at\" TIMESTAMP)")
  }
}
