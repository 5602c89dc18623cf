package graft.connect

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Connector surface (SURVEY §2.1/§2.2): JDBC, CSV, Parquet, REST-JSON,
  * and the source router.
  */

/** Partitioned JDBC source/sink.
  *
  * The reference reads and writes every table over a SINGLE JDBC partition
  * (reference: utils.py:162,185 — no partitionColumn/numPartitions), the
  * #1 physical bottleneck at scale (SURVEY §4.2). Here partitioning is part
  * of the API: pass a numeric `partitionColumn` + bounds and the scan fans
  * out to `numPartitions` parallel range queries; writes inherit the
  * upstream partitioning (one connection per partition).
  */
final case class JdbcConfig(url: String, user: String = "", password: String = "",
                            driver: Option[String] = None,
                            properties: Map[String, String] = Map.empty) {
  def asOptions: Map[String, String] =
    Map("url" -> url) ++
      (if (user.nonEmpty) Map("user" -> user) else Map.empty) ++
      (if (password.nonEmpty) Map("password" -> password) else Map.empty) ++
      driver.map("driver" -> _).toMap ++ properties
}

/** DIALECT SEAM — the Derby-vs-PostgreSQL divergences that would
  * otherwise be first-deployment code changes (round-7 verdict item:
  * JDBC is spec-proven on embedded Derby, the reference targets
  * Postgres — utils.py:177-182, Raptor.py:41-58). Everything the
  * driver-side DDL path emits goes through here, so pointing the engine
  * at Postgres is a URL change: [[GraftDialect.forUrl]] picks the
  * dialect, and the Postgres SQL generation is unit-tested (JdbcSpec)
  * even though no server exists in this sandbox. Spark's own read/write
  * type mapping already dispatches on the URL via its built-in
  * JdbcDialects; this seam covers what the engine itself emits. */
sealed trait GraftDialect {
  def name: String
  def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
  /** CREATE SCHEMA statement — Postgres has IF NOT EXISTS, Derby does
    * not (its caller pre-checks the catalog instead). */
  def createSchemaSql(schema: String): String
  /** Column type DDL for the Spark type. */
  def typeDdl(dt: org.apache.spark.sql.types.DataType): String
  /** Full CREATE TABLE for a Spark schema — the explicit-DDL twin of
    * the reference's pandas `to_sql` table creation. */
  def createTableSql(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val n = if (f.nullable) "" else " NOT NULL"
      s"${quote(f.name)} ${typeDdl(f.dataType)}$n"
    }
    val qualified = table.split('.').map(quote).mkString(".")
    s"CREATE TABLE $qualified (${cols.mkString(", ")})"
  }
}

object PostgresDialect extends GraftDialect {
  import org.apache.spark.sql.types._
  val name = "postgresql"
  // bare identifier (validated upstream), matching the reference's
  // psycopg2 statement verbatim (Raptor.py:41-58)
  def createSchemaSql(schema: String): String =
    s"CREATE SCHEMA IF NOT EXISTS $schema"
  def typeDdl(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case BooleanType => "BOOLEAN"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case BinaryType => "BYTEA"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"no $name DDL mapping for $other")
  }
}

object DerbyDialect extends GraftDialect {
  import org.apache.spark.sql.types._
  val name = "derby"
  /** Derby has no IF NOT EXISTS — [[Jdbc.ensureSchema]] consults the
    * catalog first and tolerates the concurrent-create race. */
  def createSchemaSql(schema: String): String = s"CREATE SCHEMA $schema"
  def typeDdl(dt: DataType): String = dt match {
    case StringType => "VARCHAR(32672)" // Derby's max VARCHAR
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case BooleanType => "BOOLEAN"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType =>
      // Derby's max precision is 31; Spark decimals up to 38 must clamp
      // (documented lossy edge — a >31-digit decimal needs VARCHAR)
      s"DECIMAL(${math.min(d.precision, 31)},${math.min(d.scale, 31)})"
    case other => throw new IllegalArgumentException(
      s"no $name DDL mapping for $other")
  }
}

object GraftDialect {
  /** URL-dispatched dialect — deployment is a config change. */
  def forUrl(url: String): GraftDialect =
    if (url.startsWith("jdbc:postgresql")) PostgresDialect
    else if (url.startsWith("jdbc:derby")) DerbyDialect
    else DerbyDialect // conservative ANSI-ish default
}

object Jdbc {
  def readTable(spark: SparkSession, cfg: JdbcConfig, table: String,
                partitionColumn: Option[String] = None,
                lowerBound: Long = 0, upperBound: Long = 0,
                numPartitions: Int = 1): DataFrame = {
    var r = spark.read.format("jdbc").options(cfg.asOptions)
      .option("dbtable", table)
    partitionColumn.foreach { c =>
      r = r.option("partitionColumn", c)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }
    r.load()
  }

  /** Query pushdown scan — the reference's `(q) as subquery` wrap
    * (reference: Raptor.py:20-38) is what Spark's `query` option does. */
  def readQuery(spark: SparkSession, cfg: JdbcConfig, sql: String): DataFrame =
    spark.read.format("jdbc").options(cfg.asOptions).option("query", sql).load()

  /** @param ensureSchema when true and `table` is schema-qualified,
    *   create the schema first if the database lacks it — the reference
    *   self-heals this way before every write (Raptor.py:41-58
    *   `_ensure_schema_exists` inside `_write_into_table`), so a fresh
    *   database works on first run. */
  def write(df: DataFrame, cfg: JdbcConfig, table: String, mode: SaveMode,
            ensureSchema: Boolean = false): Unit = {
    if (ensureSchema) table.split('.') match {
      case Array(schema, _) => Jdbc.ensureSchema(cfg, schema)
      case _                => ()
    }
    df.write.format("jdbc").options(cfg.asOptions)
      .option("dbtable", table).mode(mode).save()
  }

  /** Driver-side `CREATE SCHEMA` if absent (reference: Raptor.py:41-58,
    * psycopg2 `CREATE SCHEMA IF NOT EXISTS`). Portable across engines
    * that lack `IF NOT EXISTS` (Derby): consult catalog metadata first,
    * then create, and tolerate the already-exists race by re-checking —
    * two concurrent writers must both come out with the schema present.
    * The name is validated against a bare-identifier pattern, not
    * interpolated blindly. */
  def ensureSchema(cfg: JdbcConfig, schema: String): Unit = {
    require(schema.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"schema must be a bare identifier, got '$schema'")
    // honor the SAME config surface the Spark jdbc path uses: load the
    // configured driver class (DriverManager only auto-discovers
    // service-registered drivers) and forward connection properties —
    // otherwise a config that works for every read/write fails here
    cfg.driver.foreach(Class.forName)
    val props = new java.util.Properties()
    if (cfg.user.nonEmpty) props.setProperty("user", cfg.user)
    if (cfg.password.nonEmpty) props.setProperty("password", cfg.password)
    cfg.properties.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(cfg.url, props)
    try {
      def exists(): Boolean = {
        val rs = conn.getMetaData.getSchemas
        try {
          var found = false
          while (!found && rs.next())
            found = rs.getString("TABLE_SCHEM").equalsIgnoreCase(schema)
          found
        } finally rs.close()
      }
      if (!exists()) {
        val st = conn.createStatement()
        try st.executeUpdate(GraftDialect.forUrl(cfg.url).createSchemaSql(schema))
        catch { case e: java.sql.SQLException => if (!exists()) throw e }
        finally st.close()
      }
    } finally conn.close()
  }
}

object Csv {
  /** Contract-first CSV scan: no inference (the reference's inferSchema
    * double-reads every file — reference: ingestion_task.py:207-212). */
  def read(spark: SparkSession, path: String, contract: StructType,
           header: Boolean = true, sep: String = ","): DataFrame =
    spark.read.schema(contract).option("header", header.toString)
      .option("sep", sep).csv(path)

  /** Inference variant kept for drift *detection* flows only. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Result of a reject-routing scan. `clean` and `rejects` are views
    * over one cached scan; call [[release]] after both are consumed —
    * unpersisting a derived frame does NOT release the parent's cache
    * entry, so the handle owns it. */
  final case class CsvWithRejects(clean: DataFrame, rejects: DataFrame,
                                  private val cached: DataFrame) {
    def release(): Unit = { cached.unpersist(); () }
  }

  /** Contract-first scan that ROUTES malformed rows instead of silently
    * nulling them (PERMISSIVE default) or dropping the task (FAILFAST):
    * returns clean rows + reject rows with the raw line. One pass —
    * the corrupt-record column is captured during the same scan; the
    * reject frame carries the raw text for quarantine sinks. */
  def readWithRejects(spark: SparkSession, path: String, contract: StructType,
                      header: Boolean = true, sep: String = ",")
      : CsvWithRejects = {
    val raw = "_graft_raw"
    val withRaw = StructType(contract.fields :+
      StructField(raw, org.apache.spark.sql.types.StringType))
    val df = spark.read.schema(withRaw)
      .option("header", header.toString).option("sep", sep)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", raw)
      .csv(path)
      .cache() // one scan serves both routes; release() frees it
    val clean = df.filter(org.apache.spark.sql.functions.col(raw).isNull)
      .drop(raw)
    val rejects = df.filter(org.apache.spark.sql.functions.col(raw).isNotNull)
      .select(org.apache.spark.sql.functions.col(raw).as("raw_record"))
    CsvWithRejects(clean, rejects, df)
  }

  /** Date-templated path resolver, e.g. `{date}/sales_{date}.csv`
    * (reference: ingestion_task.py:204-205 computes this from the wall
    * clock; here the date is injected). */
  def datedPath(template: String, date: java.time.LocalDate): String = {
    val d = date.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    template.replace("{date}", d)
  }
}

object ParquetIO {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Run SQL over a parquet file via a temp view (reference:
    * Raptor.py:89-101). */
  def sqlOver(spark: SparkSession, path: String, view: String, sql: String): DataFrame = {
    spark.read.parquet(path).createOrReplaceTempView(view)
    spark.sql(sql)
  }

  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}

/** Columnar/line formats beyond the reference's CSV/parquet surface:
  * ORC (the other splittable columnar format a lake migration meets) and
  * JSON-lines (the interchange format most crawl/annotation feeds arrive
  * in). Same contract-first discipline as [[Csv]] — JSONL reads take an
  * explicit schema, never inference (inference double-scans and races
  * schema drift); ORC carries its own schema like parquet. Both formats
  * are splittable, so scans parallelize per file-split at any size.
  */
object Orc {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}

object Jsonl {
  /** Contract-first JSON-lines scan; malformed lines are ROUTED, not
    * silently nulled: rows with a populated corrupt-record column carry
    * the raw line for quarantine (same single-pass discipline as
    * [[Csv.readWithRejects]]). */
  def read(spark: SparkSession, path: String, contract: StructType): DataFrame =
    spark.read.schema(contract).json(path)

  def readWithRejects(spark: SparkSession, path: String,
                      contract: StructType): Csv.CsvWithRejects = {
    import org.apache.spark.sql.functions.col
    val corrupt = "_corrupt_record"
    val widened = StructType(contract.fields :+
      StructField(corrupt, org.apache.spark.sql.types.StringType, nullable = true))
    val scanned = spark.read.schema(widened)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
      .persist()
    Csv.CsvWithRejects(
      clean = scanned.filter(col(corrupt).isNull).drop(corrupt),
      rejects = scanned.filter(col(corrupt).isNotNull)
        .select(col(corrupt).as("raw")),
      cached = scanned)
  }

  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}

/** Binary-file DIRECTORY source — the ingest seam for raw media assets
  * dropped as files (images/audio/video on a landing bucket) rather than
  * as a binary column inside a table. Spark's `binaryFile` format yields
  * (path, modificationTime, length, content) with partition-parallel
  * listing and reading; `pathGlobFilter` prunes at the LISTING, so a
  * mixed drop never opens the files it skips (deployments additionally
  * cap `spark.sql.sources.binaryFile.maxLength` so a stray oversized
  * asset fails loudly instead of OOMing a task). The content column
  * feeds the exact byte-level decoders the binary-COLUMN path uses
  * ([[graft.ops.Multimodal]] / [[graft.functions.ImageCodec]]), so
  * file-drop and table-column multimodal ingest share one decode seam.
  */
object BinaryDir {
  def read(spark: SparkSession, path: String,
           glob: Option[String] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    glob.fold(base)(g => base.option("pathGlobFilter", g)).load(path)
  }
}

/** REST-JSON source (reference: utils.py:34-105): driver-side GET with
  * optional OAuth2 password-grant Bearer auth, payload `{"data":[{...}]}`
  * materialized as a DataFrame. The HTTP transport is pluggable so tests
  * inject a fake; the real transport uses java.net.http. Rows land via
  * spark.read.json on a Dataset[String] with an explicit contract — never
  * inference (SURVEY §1.4).
  */
object Rest {
  type Http = String => String // url -> body

  def defaultHttp(headers: Map[String, String]): Http = { url =>
    val client = java.net.http.HttpClient.newHttpClient()
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  /** Fetch `{"data":[...]}` and project the `data` array through a
    * contract. JSON parsing is distributed (spark.read.json over a
    * 1-element dataset is fine for API-sized payloads; large payloads can
    * be split upstream). */
  def readData(spark: SparkSession, url: String, contract: StructType,
               http: Http, dataField: String = "data"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val body = http(url)
    val env = new StructType().add(dataField,
      org.apache.spark.sql.types.ArrayType(contract))
    spark.read.schema(env).json(Seq(body).toDS())
      .select(explode(col(dataField)).as("row"))
      .select("row.*")
  }

  /** OAuth2 password-grant token fetch → Bearer header map (reference:
    * utils.py:66-82). Kept driver-side and transport-pluggable. */
  def bearer(token: String): Map[String, String] =
    Map("Authorization" -> s"Bearer $token")

  type HttpPost = (String, String) => String // (url, form body) -> response body

  def defaultHttpPost: HttpPost = { (url, form) =>
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(form))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  /** Full password-grant flow: POST the form, extract `access_token` from
    * the JSON response, return the Bearer header map (reference flow:
    * utils.py:69-81 — token POST then authed GET). Transport-pluggable so
    * tests inject a fake; token parsing is a targeted extraction, not a
    * JSON framework dependency. */
  def oauthPasswordGrant(tokenUrl: String, username: String, password: String,
                         post: HttpPost = defaultHttpPost): Map[String, String] = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val body = post(tokenUrl,
      s"grant_type=password&username=${enc(username)}&password=${enc(password)}")
    val m = "\"access_token\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(body)
      .getOrElse(throw new IllegalStateException(
        s"no access_token in token response from $tokenUrl"))
    bearer(m.group(1))
  }
}

/** Source router (reference: Raptor.py:113-139): dispatch a logical source
  * name to a reader factory. */
final class SourceRegistry private (
    factories: Map[String, (SparkSession, String) => DataFrame]) {
  def withSource(name: String)(f: (SparkSession, String) => DataFrame): SourceRegistry =
    new SourceRegistry(factories + (name -> f))
  def read(spark: SparkSession, source: String, arg: String): DataFrame =
    factories.getOrElse(source,
      throw new IllegalArgumentException(
        s"unknown source '$source'; known: ${factories.keys.mkString(", ")}"))(spark, arg)
}

object SourceRegistry {
  def empty: SourceRegistry = new SourceRegistry(Map.empty)
}
