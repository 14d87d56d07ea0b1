package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-driven extractor tests — DOM shapes per FIXTURES.md §A6,
  * selectors per the cited reference lines (no Spark needed: extractors
  * are pure String functions).
  */
class ExtractorsSpec extends AnyFunSuite {

  val page404 = """<html><body><div class="container404">Not found</div></body></html>"""
  val pageDeletedHcpcs = """<html><h1>Deleted HCPCS Codes</h1></html>"""

  val pageCpt = """
    <html><body>
    <div class="newbread">
      <a href="/cpt-codes/">CPT</a>
      <a href="/cpt-codes-range/0042T-0184T/">Lab Analyses</a>
    </div>
    <div class="layout2_code"><h1>0042T, Rbc dna hea 35 ag 11 bld grp</h1></div>
    <div class="sub_head_detail">Blood typing performed by laboratory analysis</div>
    <div class="modcross_list"><table><tbody>
      <tr><td>26</td><td>Professional Component</td></tr>
      <tr><td>59</td><td>Distinct Procedural Service</td></tr>
    </tbody></table></div>
    <div id="cpt_betos"><strong>Code:</strong> T1H <strong>Description:</strong> Lab tests - other</div>
    <div id="cpt_guidelines">Use 0001U once per episode</div>
    <div id="cpt_advice">Check payer policy first</div>
    <div id="fullLayterm"><p>A summary paragraph.</p>
      Full lay explanation of the test <a href="#">Read Less</a></div>
    <div id="cpt_report">Reported with modifier 90</div>
    <div id="cpt_revenue_cross"><table class="points_table">
      <tr><th>Revenue Code</th><th>Description</th></tr>
      <tr><td>0300</td><td>Laboratory</td></tr>
      <tr><td>0301</td><td>Chemistry</td></tr>
    </table></div>
    <div id="ndc"><table>
      <tr><td>12345-678-90</td><td>DrugName</td><td>Labeler Inc</td><td>5 mg</td><td>ML</td></tr>
    </table></div>
    <div id="pcsdata"><table class="points_table"><tr><td>0016070</td><td>Bypass</td></tr></table></div>
    <div id="cpt_symbol_div">
      <div class="icon-dic-o">#: New code</div>
      <div class="icon-dic-o">+: Add-on code</div>
    </div>
    </body></html>"""

  val pageRevenueUnavailable =
    """<div id="cpt_revenue_cross">Data Not Available</div>"""

  test("E1: 404 predicate") {
    assert(Extractors.isError404Page(page404))
    assert(!Extractors.isError404Page(pageCpt))
  }

  test("E2: deleted-HCPCS predicate") {
    assert(Extractors.isDeletedHcpcsPage(pageDeletedHcpcs))
    assert(!Extractors.isDeletedHcpcsPage(pageCpt))
  }

  test("deleted-code span marker is word-bounded and case-insensitive") {
    assert(Extractors.isDeletedCode("""<span>Code Deleted in 2020</span>"""))
    assert(!Extractors.isDeletedCode("""<span>Undeleted</span>"""))
  }

  test("E4: short description = h1 after first comma, trimmed") {
    assert(Extractors.getShortDescription(pageCpt)
      .contains("Rbc dna hea 35 ag 11 bld grp"))
  }

  test("E5: long description from sub_head_detail") {
    assert(Extractors.getLongDescription(pageCpt)
      .contains("Blood typing performed by laboratory analysis"))
  }

  test("E6: breadcrumb trail in DOM order") {
    assert(Extractors.getMainIntervalName(pageCpt)
      .contains(Seq("CPT", "Lab Analyses")))
  }

  test("E7: CPT range regex vs HCPCS range regex") {
    assert(Extractors.getMainInterval(pageCpt, isCpt = true).contains("0042T-0184T"))
    assert(Extractors.getMainInterval(
      """<span><a href="/hcpcs-codes-range/A0021-A0999/">x</a></span>""",
      isCpt = false).contains("A0021-A0999"))
  }

  test("E8: modifier rows as (modifier, description) pairs") {
    assert(Extractors.getModifierRows(pageCpt) ==
      Seq(("26", "Professional Component"), ("59", "Distinct Procedural Service")))
  }

  test("E9: betos code/description with Code: prefix stripped") {
    val (code, desc) = Extractors.getBetos(pageCpt)
    assert(code.contains("T1H"))
    assert(desc.exists(_.startsWith("Lab tests")))
  }

  test("E10/E11/E13: tab panes") {
    assert(Extractors.getGuidelines(pageCpt).contains("Use 0001U once per episode"))
    assert(Extractors.getAdvice(pageCpt).contains("Check payer policy first"))
    assert(Extractors.getReport(pageCpt).contains("Reported with modifier 90"))
  }

  test("E12: lay term removes the Read-Less node; summary is first <p>") {
    val (summary, lay) = Extractors.getLayTerm(pageCpt)
    assert(summary.contains("A summary paragraph."))
    assert(lay.exists(_.contains("Full lay explanation of the test")))
    assert(!lay.exists(_.toLowerCase.contains("read less")))
  }

  test("JS-gated pane degrades, never mis-extracts (VERDICT r16 #7)") {
    // A plain-HTTP capture of a JS-rendered page (the reference drives
    // headless Chrome — chrome_config.py:3-17): panes the server leaves
    // as empty JS shells must take the absent-pane branch...
    val jsShell =
      """<div id="cpt_guidelines"></div>
         <div id="cpt_advice">  </div>
         <div id="fullLayterm"></div>"""
    assert(Extractors.getGuidelines(jsShell).isEmpty)
    assert(Extractors.getAdvice(jsShell).isEmpty)
    assert(Extractors.getLayTerm(jsShell) == (None, None))
    // ...and a lay-term pane captured STILL COLLAPSED (the browser
    // clicks "Read More" before capture — procedure_code.py:247-293)
    // degrades to the truncated text with the UI artifact stripped
    val collapsed =
      """<div id="fullLayterm"><p>A summary.</p>
         Truncated lay text <a href="#">Read More</a></div>"""
    val (summary, lay) = Extractors.getLayTerm(collapsed)
    assert(summary.contains("A summary."))
    assert(lay.exists(_.endsWith("Truncated lay text")))
    assert(!lay.exists(_.toLowerCase.contains("read more")))
    // the toggle strip is anchored to Less/More as whole words: a
    // content-bearing link whose text merely pattern-matches the
    // letter cross-product ("Read Lore") must SURVIVE (ADVICE r17)
    val loreLink =
      """<div id="fullLayterm"><p>A summary.</p>
         See also <a href="/lore">Read Lore</a> for background</div>"""
    val (_, layLore) = Extractors.getLayTerm(loreLink)
    assert(layLore.exists(_.contains("Read Lore")))
  }

  test("E14: revenue lookup distinguishes null (unavailable) from rows") {
    assert(Extractors.getRevenueCodeLookup(pageCpt).contains(Seq("0300", "0301")))
    assert(Extractors.getRevenueCodeLookup(pageRevenueUnavailable).isEmpty)
    // missing table -> None; header-only table -> Some(empty)
    assert(Extractors.getRevenueCodeLookup(
      """<div id="cpt_revenue_cross">no table yet</div>""").isEmpty)
    assert(Extractors.getRevenueCodeLookup(
      """<div id="cpt_revenue_cross"><table class="points_table">
         <tr><th>h</th></tr></table></div>""").contains(Seq.empty))
  }

  test("E16: NDC rows -> 5-field entries + alternate-id list") {
    val (ids, rows) = Extractors.getNdc(pageCpt)
    assert(ids == Seq("12345-678-90"))
    assert(rows.head == graft.schema.NdcEntry(
      "12345-678-90", "DrugName", "Labeler Inc", "5 mg", "ML"))
  }

  test("E17: PCS codes from pcsdata table") {
    assert(Extractors.getIcdPcsX(pageCpt).contains(Seq("0016070")))
  }

  test("E18: symbols split once on colon") {
    assert(Extractors.getCptCodeSymbols(pageCpt, isCpt = true)
      .contains(Seq("New code", "Add-on code")))
  }

  test("whitespace normalization matches ' '.join(s.split())") {
    assert(Extractors.normWs("  a\t b\n\nc  ") == "a b c")
  }

  val pageDeletedFull = """
    <html><body>
    <span>Code Deleted</span>
    <div class="alert alert-danger">Deleted  effective
      December 31, 2021</div>
    <div class="row"><div class="col">Advice: see the crosswalk</div></div>
    <div class="panel-body tab-pane">The provider administers the first dose
      of the COVID–19 vaccine</div>
    <div class="panel-body tab-pane">Guidelines found in the archive</div>
    <div class="panel panel-default">
      <div class="panel-heading">Code Descriptor</div>
      <div class="panel-body tab-pane">Immunization administration</div>
    </div>
    </body></html>"""

  test("E3: deleted branch — 5-tuple with the reference's quirks") {
    val Some((date, advice, lay, guide, desc)) = Extractors.getDeleted(pageDeletedFull)
    assert(date.contains("Deleted effective December 31, 2021")) // ws-normalized
    // document-order div scan: the outer .row contains 'Advice:' and has
    // no <p>, so the split-after-marker path fires (reference quirk)
    assert(advice.contains("see the crosswalk"))
    // COVID en-dash match on panel-body tab-pane text
    assert(lay.exists(_.contains("COVID–19 vaccine")))
    assert(guide.exists(_.startsWith("Guidelines found")))
    assert(desc.contains("Immunization administration"))
    // no Deleted span -> None
    assert(Extractors.getDeleted("<div>nothing here</div>").isEmpty)
  }
}
