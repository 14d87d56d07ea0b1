package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** One registered query: Spark implementation + (optionally) the
  * equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  *
  * Determinism rules used throughout (they make results hash-comparable
  * across engines and across runs):
  *  - money SUMs go through `decimal` (exact, associative — immune to
  *    partition-order float reassociation);
  *  - per-row double arithmetic mirrors the oracle expression op-for-op
  *    (same IEEE ops in the same order → bit-identical, no rounding);
  *  - every result has a total-order ORDER BY;
  *  - timestamps leave the engine as formatted strings (UTC session).
  */
final case class Q(name: String, oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
object Catalog extends CatalogCore with CatalogDedup with CatalogAnn with CatalogText with CatalogMultimodal with CatalogExtract with CatalogPipeline {
  /** Every registered query, per-family lists concatenated —
    * same names as the pre-split monolith (VERDICT r16 #8).
    */
  val all: Seq[Q] = coreQueries ++ dedupQueries ++ annQueries ++ textQueries ++ multimodalQueries ++ extractQueries ++ pipelineQueries
}
