package graft.pipeline

/** Job configuration — the reference's env-var surface
  * (`/root/reference/crawler/src/utils/config.py:10-33` and the
  * import-time reads at `procedure_code.py:27-39`) as a typed case class
  * with an env loader for drop-in job parity.
  *
  * Divergence by design: missing variables fail at `fromEnv` call time
  * with a named error instead of crashing at import time, and defaults
  * are explicit.
  */
final case class Config(
    baseSite: String,
    logicalDate: String,
    database: String,
    procedureCodesTable: String,
    modifiersTable: String,
    ndcTable: String,
    fetchPartitions: Int,
    debug: Boolean)

object Config {
  def fromEnv(env: Map[String, String] = sys.env): Config = {
    def req(k: String): String =
      env.getOrElse(k, throw new IllegalArgumentException(s"missing required env var $k"))
    Config(
      baseSite = req("BASE_SITE"),
      logicalDate = env.getOrElse("LOGICAL_DATE",
        java.time.LocalDate.now().toString),
      database = env.getOrElse("GRAFT_DATABASE", "default"),
      procedureCodesTable = env.getOrElse("GRAFT_CODES_TABLE", "procedure_codes"),
      modifiersTable = env.getOrElse("GRAFT_MODIFIERS_TABLE", "procedure_code_modifiers"),
      ndcTable = env.getOrElse("GRAFT_NDC_TABLE", "procedure_code_ndc"),
      fetchPartitions = env.getOrElse("GRAFT_FETCH_PARTITIONS", "8").toInt,
      debug = env.getOrElse("DEBUG", "false").equalsIgnoreCase("true"))
  }
}
