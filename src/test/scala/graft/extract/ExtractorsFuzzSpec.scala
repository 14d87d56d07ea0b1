package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Adversarial-HTML robustness (VERDICT r17 #6): the crawl source's
  * real-world input is exactly the malformed HTML the fixture suite
  * never exercises — unclosed tags, same-name containers nested past
  * depth 2, attribute quoting variants, multi-megabyte pages. Every
  * public extractor must (a) never throw and (b) terminate — the
  * depth-balanced scanner (`Extractors.balancedInner`) walks open/close
  * token matches with a mutable depth counter, so an unclosed container
  * must fall out of the token iterator (None), not loop.
  *
  * The generators BIAS toward the reference's own DOM vocabulary
  * (div/span/table/tr/td, the real ids and class names) so the fuzz
  * hits the extractors' match paths instead of bouncing off the first
  * regex; pure-noise strings are mixed in as a degenerate case.
  */
class ExtractorsFuzzSpec extends AnyFunSuite {

  private val tagNames = Gen.oneOf("div", "span", "table", "tr", "td", "p",
    "a", "h1", "strong", "tbody", "script")
  private val realIds = Gen.oneOf("fullLayterm", "hcpcs_layterm",
    "cpt_betos", "cpt_guidelines", "cpt_advice", "cpt_report",
    "cpt_revenue_cross", "ndc", "pcsdata", "cpt_symbol_div", "icd_cross",
    "icd10cm_cross")
  private val realClasses = Gen.oneOf("container404", "layout2_code",
    "sub_head_detail", "modcross_list", "alert", "alert-danger",
    "points_table", "icon-dic-o", "breadcrumb")

  private val textChunk = Gen.oneOf(
    "Advice: check payer policy", "Deleted", "Read More", "Read Less",
    "Deleted HCPCS Codes", "0042T, Short desc", "Code: T1H",
    "12345-678-90", "plain text é–  unicode", "", " ",
    "a" * 50, "<", ">", "\"", "'")

  // attribute quoting variants: double, single, none, unterminated
  private def attr(name: String, value: String): Gen[String] = Gen.oneOf(
    s"""$name="$value"""", s"$name='$value'", s"$name=$value",
    s"""$name="$value""", s"""$name = "$value"""")

  private val attrGen: Gen[String] = for {
    kind <- Gen.oneOf(0, 1, 2)
    v <- kind match {
      case 0 => realIds.flatMap(attr("id", _))
      case 1 => realClasses.flatMap(attr("class", _))
      case _ => Gen.const("href=\"#\"")
    }
  } yield v

  /** One malformed-HTML fragment: open tags (possibly never closed),
    * close tags (possibly never opened), text, and recursion. Depth of
    * same-name nesting is driven well past 2 by the recursive case.
    */
  private def fragment(depth: Int): Gen[String] =
    if (depth <= 0) textChunk
    else Gen.frequency(
      3 -> textChunk,
      3 -> (for {
        t <- tagNames; a <- attrGen; inner <- fragment(depth - 1)
        close <- Gen.frequency(3 -> Gen.const(s"</$t>"), 1 -> Gen.const(""))
      } yield s"<$t $a>$inner$close"),
      1 -> tagNames.map(t => s"</$t>"),
      1 -> (for {
        t <- tagNames; a <- attrGen
        n <- Gen.choose(3, 8) // same-name nesting beyond depth 2
        inner <- fragment(depth - 1)
      } yield (s"<$t $a>" * n) + inner + (s"</$t>" * (n - 1))),
      1 -> Gen.listOfN(2, fragment(depth - 1)).map(_.mkString))

  private val page: Gen[String] =
    Gen.listOfN(8, fragment(3)).map(_.mkString("<html><body>", "", ""))

  private def allExtractors(html: String): Unit = {
    Extractors.normWs(html); Extractors.textOf(html)
    Extractors.isError404Page(html); Extractors.isDeletedHcpcsPage(html)
    Extractors.isDeletedCode(html); Extractors.getDateDeleted(html)
    Extractors.getDeletedAdvice(html); Extractors.getDeletedLayTerm(html)
    Extractors.getDeletedGuidelines(html)
    Extractors.getDeletedDescription(html); Extractors.getDeleted(html)
    Extractors.getShortDescription(html); Extractors.getLongDescription(html)
    Extractors.getMainIntervalName(html)
    Extractors.getMainInterval(html, isCpt = true)
    Extractors.getMainInterval(html, isCpt = false)
    Extractors.getModifierRows(html); Extractors.getBetos(html)
    Extractors.getGuidelines(html); Extractors.getAdvice(html)
    Extractors.getReport(html); Extractors.getLayTerm(html)
    Extractors.getRevenueCodeLookup(html); Extractors.getIcd10Cm(html)
    Extractors.getNdc(html); Extractors.getIcdPcsX(html)
    Extractors.getCptCodeSymbols(html, isCpt = true)
    Extractors.getCptCodeSymbols(html, isCpt = false)
    Extractors.getOfficialDescriptor(html)
    ()
  }

  test("no extractor throws on adversarial HTML (200 generated pages)") {
    // drive ScalaCheck's generator directly with a FIXED seed sequence —
    // deterministic across runs (no scalatest bridge lib in the build),
    // and the failing sample prints verbatim instead of shrinking into
    // different malformed HTML
    val params = Gen.Parameters.default.withSize(60)
    var seed = Seed(42L)
    for (i <- 1 to 200) {
      val html = page.pureApply(params, seed)
      seed = seed.next
      try allExtractors(html)
      catch {
        case e: Throwable =>
          fail(s"sample #$i threw ${e.getClass.getName}: ${e.getMessage}\n" +
            s"HTML (${html.length} chars): ${html.take(2000)}")
      }
    }
  }

  test("unclosed containers yield None/empty, never a hang or throw") {
    // every reference id opened and NEVER closed — the depth counter
    // exhausts the token iterator and must return absent
    val unclosed = Seq("fullLayterm", "cpt_guidelines", "cpt_advice",
      "ndc", "pcsdata", "cpt_revenue_cross")
      .map(id => s"""<div id="$id"><p>dangling""").mkString
    allExtractors(unclosed)
    assert(Extractors.getGuidelines(unclosed).isEmpty)
    assert(Extractors.getNdc(unclosed) == ((Seq.empty, Seq.empty)))
  }

  test("pages over 1 MB complete in bounded time") {
    val row = """<tr><td>12345-678-90</td><td>Drug</td><td>Lab</td>""" +
      """<td>5 mg</td><td>ML</td></tr>"""
    val big = s"""<html><div id="ndc"><table>${row * 12000}</table></div>""" +
      s"""<div id="fullLayterm"><p>s</p>${"x " * 200000}</div></html>"""
    assert(big.length > (1 << 20))
    val t0 = System.nanoTime()
    allExtractors(big)
    val sec = (System.nanoTime() - t0) / 1e9
    // regex-over-HTML must stay near-linear on big pages; 30s is the
    // generous CI bound for ~1.3 MB on a loaded box
    assert(sec < 30.0, s"big-page extraction took ${sec}s")
    // and the table-valued extractor actually parsed the 12k rows
    assert(Extractors.getNdc(big)._2.size == 12000)
  }

  test("deep same-name nesting (depth 40) is depth-balanced, not greedy") {
    val nested = ("<div class=\"alert alert-danger\">" * 40) +
      "core text" + ("</div>" * 40)
    val got = Extractors.getDateDeleted(nested)
    assert(got.contains("core text"))
  }
}
