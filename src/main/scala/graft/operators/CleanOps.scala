package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Work-list cleaning (reference ops P1 + P2,
  * `/root/reference/crawler/src/procedure_code.py:721-723`).
  *
  * Semantics: a code is invalid when it is null, empty after trim, or
  * case-insensitively equal to "false"; invalid codes become NULL and are
  * then dropped. Kept codes are returned trimmed (the reference compares
  * trimmed values and builds URLs from `code.strip()`, line 541).
  *
  * Pure narrow transformation — no shuffle; Catalyst folds the whole thing
  * into the scan stage, so it costs one codegen'd pass at any scale.
  */
object CleanOps {

  def cleanCodes(df: DataFrame, col: String = "code"): DataFrame = {
    val t = trim(df(col))
    df.withColumn(col, when(t === "" || lower(t) === "false", lit(null)).otherwise(t))
      .na.drop(Seq(col))
  }
}
