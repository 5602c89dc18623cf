package graft.core

/** Environment → physical-schema routing (reference:
  * ETL_Airflow/dags/tasks/utils.py:190-211 `fetch_env_schema`, selected by
  * `ENV` at DAG build time, metamorph_etl_dag.py:36).
  *
  * The reference runs the SAME pipeline code against `raw`/`legacy`
  * schemas in prod and `dev_raw`/`dev_legacy` in every other environment;
  * pipelines address layers by LOGICAL name and the environment decides
  * the physical prefix. Reproduced here as a total function the warehouse
  * and JDBC table names thread through, with the reference's exact
  * fallback semantics: anything that is not `prod` is dev.
  */
final case class EnvSchema(env: String) {
  val isProd: Boolean = env == "prod"

  private val mapping: Map[String, String] =
    if (isProd) Map("raw" -> "raw", "legacy" -> "legacy")
    else Map("raw" -> "dev_raw", "legacy" -> "dev_legacy")

  /** Physical schema for a logical layer name (`raw` / `legacy`).
    * Unknown logical names fail fast — a typo routed to a default schema
    * would silently split a table across environments. */
  def resolve(logical: String): String =
    mapping.getOrElse(logical,
      throw new IllegalArgumentException(
        s"unknown logical schema '$logical'; known: ${mapping.keys.mkString(", ")}"))

  /** Qualified physical table name for JDBC sinks: `schema.table`. */
  def qualify(logical: String, table: String): String =
    s"${resolve(logical)}.$table"
}

object EnvSchema {
  /** Environment selection as the reference does it: `ENV` variable,
    * absent ⇒ dev (metamorph_etl_dag.py:36 `os.getenv('ENV','dev')`).
    * The lookup is injectable so specs pin both branches. */
  def fromEnv(lookup: String => Option[String] = sys.env.get): EnvSchema =
    EnvSchema(lookup("ENV").getOrElse("dev"))
}
