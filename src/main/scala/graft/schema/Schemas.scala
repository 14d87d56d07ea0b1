package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the reference's three output tables
  * (`/root/reference/crawler/src/procedure_code.py:41-43`) — fixed,
  * explicitly-typed `StructType`s per SURVEY §1.4 (schema-on-write), plus
  * typed case classes for `Dataset[T]` use.
  *
  * All columns nullable (the reference fills 15 of 21 with None on the
  * deleted-page branch, `procedure_code.py:576-598`). Array columns are
  * order-significant (DOM order) — ArrayType(StringType) per SURVEY §1.2.
  */
object Schemas {

  private def s(name: String)  = StructField(name, StringType, nullable = true)
  private def as(name: String) = StructField(name, ArrayType(StringType, containsNull = true), nullable = true)

  /** 21-column `procedure_codes` (`procedure_code.py:41`). */
  val procedureCodes: StructType = StructType(Seq(
    s("code"), s("code_type"), s("main_interval"), as("main_interval_name"),
    as("modifiers"), s("short_description"), s("long_description"),
    s("description"), s("summary"), s("date_deleted"), s("betos_code"),
    s("betos_description"), s("guidelines"), s("advice"), s("lay_term"),
    s("report"), as("revenue_lookup"), as("icd10_cm"), as("ndc_alternate_id"),
    as("icd_10_pcs_x"), as("cpt_code_symbols")
  ))

  /** 2-column `procedure_code_modifiers` (`procedure_code.py:42`). */
  val procedureCodeModifiers: StructType = StructType(Seq(s("modifier"), s("description")))

  /** 5-column `procedure_code_ndc` (`procedure_code.py:43`). */
  val procedureCodeNdc: StructType = StructType(Seq(
    s("ndc_alternate_id"), s("drug_name"), s("labeler_name"),
    s("hcpcs_dosage"), s("bill_unit")
  ))

  /** Error-channel row (`error_handler.py:24-28`). */
  val airflowErrors: StructType = StructType(Seq(
    s("dag_id"), s("task_id"), s("run_id"), s("error")
  ))
}

/** Typed row for the NDC child table (`procedure_code.py:437-443`). */
final case class NdcEntry(
    ndc_alternate_id: String,
    drug_name: String,
    labeler_name: String,
    hcpcs_dosage: String,
    bill_unit: String)

/** Typed row for the modifiers child table (`procedure_code.py:42`). */
final case class Modifier(modifier: String, description: String)

/** Typed result of the E3 deleted-page branch
  * (`procedure_code.py:60-111`): the 5 sparse fields.
  */
final case class DeletedFields(
    date_deleted: String,
    advice: String,
    lay_term: String,
    guidelines: String,
    description: String)
