package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.sinks.ParquetSink

/** Error channel (K7/X5, `error_handler.py:13-39`): on pipeline failure,
  * persist one `(dag_id, task_id, run_id, error)` row and NEVER throw —
  * the reference returns True even when its own insert fails (`:37-39`),
  * because the error path must not kill the job it is reporting on.
  *
  * The reference's Postgres sink becomes a parquet append here; swap in
  * [[graft.sources.Jdbc.writeAppend]] where a database exists.
  */
object ErrorChannel {

  /** Parse the Airflow-style run-spec JSON (`{"dag_id":…,"task_id":…,
    * "run_id":…}`) and append the error row. `error_handler.py:15-22`
    * falls back to literal-eval on malformed JSON; here any parse
    * failure degrades to nulls rather than losing the error text.
    */
  def register(spark: SparkSession, airflowSpecJson: String, error: Throwable,
      sinkPath: String): Boolean = {
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val errText = s"${error.getClass.getName} ${error.getMessage}" // `:23`
      val row = Seq((airflowSpecJson, errText)).toDF("spec", "error")
        .select(
          get_json_object(col("spec"), "$.dag_id").as("dag_id"),
          get_json_object(col("spec"), "$.task_id").as("task_id"),
          get_json_object(col("spec"), "$.run_id").as("run_id"),
          col("error"))
      ParquetSink.writeDataset(row, sinkPath, mode = "append")
      true
    } catch {
      case _: Exception => true // swallow-and-log semantics (`:37-39`)
    }
  }
}
