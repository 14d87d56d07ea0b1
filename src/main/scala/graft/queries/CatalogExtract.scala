package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Reference-extraction family (ref01-ref04): the crawler's
  * HTML extraction semantics over fixture pages.
  * Split from the monolithic Catalog object (VERDICT r16 #8) — pure
  * file move, zero semantic change.
  */
private[queries] trait CatalogExtract extends CatalogShared {


  // =====================================================================
  // C. Reference-parity extraction surface (SURVEY §2.9) — HTML built
  // deterministically from corpus columns so the oracle can check the
  // extraction semantics relationally.
  // =====================================================================

  private val ref01 = Q("ref01_extract_short_desc", Some("""
    WITH pages AS (
      SELECT p_partkey,
        '<div class="layout2_code"><h1>' || p_brand || ', ' || p_name || '</h1></div>' AS html
      FROM part WHERE p_partkey <= 500)
    SELECT p_partkey, trim(regexp_extract(html, '<h1>[^,<]*,([^<]*)</h1>', 1)) AS short_description
    FROM pages ORDER BY p_partkey"""),
    (s, d) => {
      val pages = T(s, d, "part").where(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          concat(lit("<div class=\"layout2_code\"><h1>"), col("p_brand"),
            lit(", "), col("p_name"), lit("</h1></div>")).as("html"))
      pages.select(col("p_partkey"),
          graft.extract.Extractors.shortDescriptionUdf(col("html")).as("short_description"))
        .orderBy("p_partkey")
    })


  // E8/E20 table-valued extraction: HTML built per region holding one
  // modifier-table row per nation; the extraction UDF parses the rows
  // back out and explode() forms the child relation — checked against
  // the relational identity the HTML was built from.
  private val ref02 = Q("ref02_extract_modifiers", Some("""
    SELECT r.r_name, cast(n.n_nationkey as varchar) AS modifier, n.n_name AS description
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    ORDER BY r_name, modifier"""),
    (s, d) => {
      val joined = T(s, d, "region")
        .join(T(s, d, "nation"), col("n_regionkey") === col("r_regionkey"))
      val pages = joined.groupBy("r_name")
        .agg(concat(lit("""<div class="modcross_list"><table>"""),
          array_join(transform(
            array_sort(collect_list(struct(col("n_nationkey"), col("n_name")))),
            x => concat(lit("<tr><td>"), x.getField("n_nationkey").cast("string"),
              lit("</td><td>"), x.getField("n_name"), lit("</td></tr>"))), ""),
          lit("</table></div>")).as("html"))
      pages.select(col("r_name"),
          explode(graft.extract.Extractors.modifierRowsUdf(col("html"))).as("m"))
        .select(col("r_name"), col("m.modifier"), col("m.description"))
        .orderBy("r_name", "modifier")
    })


  // E3/P6 deleted-page branch checked relationally: pages are built
  // deterministically from orders columns (every third order carries the
  // Deleted span; every fifth adds the COVID lay-term pane the reference
  // special-cases), the composite extractor parses them back, and the
  // oracle states the identity the HTML encodes.
  private val ref03 = Q("ref03_extract_deleted", Some("""
    SELECT o_orderkey,
      'Deleted on ' || strftime(o_orderdate, '%Y-%m-%d') AS date_deleted,
      'Priority ' || o_orderpriority AS advice,
      CASE WHEN o_orderkey % 5 = 0
           THEN 'The provider administers the first dose of the COVID–19 vaccine.'
           ELSE NULL END AS lay_term,
      'No HCPCS guidelines recorded' AS guidelines,
      'DESC ' || o_orderstatus AS description
    FROM orders
    WHERE o_orderkey <= 300 AND o_orderkey % 3 = 0
    ORDER BY o_orderkey"""),
    (s, d) => {
      val covidPane = "<div class=\"panel-body tab-pane\">The provider administers " +
        "the first dose of the COVID–19 vaccine.</div>"
      val pages = T(s, d, "orders").where(col("o_orderkey") <= 300)
        .select(col("o_orderkey"), concat(
          when(col("o_orderkey") % 3 === 0, "<span>Deleted</span>")
            .otherwise("<span>Active</span>"),
          lit("<div class=\"alert alert-danger\">Deleted on "),
          date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("</div>"),
          when(col("o_orderkey") % 5 === 0, covidPane).otherwise(""),
          lit("<div class=\"advice\"><p>Priority "), col("o_orderpriority"),
          lit("</p>Advice: see notes</div>"),
          lit("<div class=\"panel-body tab-pane\">No HCPCS guidelines recorded</div>"),
          lit("<div class=\"panel panel-default\"><div class=\"panel-heading\">" +
            "Code Descriptor</div><div class=\"panel-body tab-pane\">DESC "),
          col("o_orderstatus"), lit("</div></div>")).as("html"))
      pages
        .withColumn("del", graft.extract.Extractors.deletedUdf(col("html")))
        .where(col("del").isNotNull)
        .select(col("o_orderkey"),
          col("del.date_deleted").as("date_deleted"),
          col("del.advice").as("advice"),
          col("del.lay_term").as("lay_term"),
          col("del.guidelines").as("guidelines"),
          col("del.description").as("description"))
        .orderBy("o_orderkey")
    })


  // E16/E20 NDC table-valued extraction round trip: one page per brand
  // holding a 5-column #ndc table row per part; the extractor parses the
  // rows back and explode() forms the NDC child relation — checked
  // against the relational identity the HTML encodes (same scheme as
  // ref02 for modifiers).
  private val ref04 = Q("ref04_extract_ndc", Some("""
    SELECT p_brand,
      cast(p_partkey as varchar) AS ndc_alternate_id,
      p_name AS drug_name,
      p_brand AS labeler_name,
      p_type AS hcpcs_dosage,
      cast(p_partkey % 7 as varchar) AS bill_unit
    FROM part WHERE p_partkey <= 500
    ORDER BY p_brand, ndc_alternate_id"""),
    (s, d) => {
      val rowHtml = (x: Column) => concat(
        lit("<tr><td>"), x.getField("p_partkey").cast("string"),
        lit("</td><td>"), x.getField("p_name"),
        lit("</td><td>"), x.getField("p_brand"),
        lit("</td><td>"), x.getField("p_type"),
        lit("</td><td>"), (x.getField("p_partkey") % 7).cast("string"),
        lit("</td></tr>"))
      val pages = T(s, d, "part").where(col("p_partkey") <= 500)
        .groupBy("p_brand")
        .agg(concat(lit("""<div id="ndc"><table>"""),
          array_join(transform(
            array_sort(collect_list(struct(col("p_partkey"), col("p_name"),
              col("p_brand"), col("p_type")))), rowHtml), ""),
          lit("</table></div>")).as("html"))
      pages.select(col("p_brand"),
          explode(graft.extract.Extractors.ndcRowsUdf(col("html"))).as("n"))
        .select(col("p_brand"), col("n.ndc_alternate_id"), col("n.drug_name"),
          col("n.labeler_name"), col("n.hcpcs_dosage"), col("n.bill_unit"))
        .orderBy("p_brand", "ndc_alternate_id")
    })

  private[queries] def extractQueries: Seq[Q] = Seq(
    ref01, ref02, ref03, ref04)
}
