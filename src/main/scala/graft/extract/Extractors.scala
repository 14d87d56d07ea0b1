package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The reference's HTML-extraction surface (SURVEY §2.9, E1-E20) as pure
  * `String => …` functions over captured page HTML, with thin UDF wrappers.
  *
  * Reference: `/root/reference/crawler/src/procedure_code.py` — each
  * function cites the lines whose observable behavior it reproduces. The
  * reference interleaved Selenium DOM access with parsing; here fetch and
  * parse are decoupled (SURVEY §7.3): these functions are deterministic
  * over an HTML string, so they unit-test without a network and run as
  * codegen-invoked UDFs inside a distributed map — no driver loop.
  *
  * Parsing is regex-over-HTML (no HTML-parser dependency is available in
  * the build environment). Patterns are written against the same DOM
  * shapes the reference selects on (selectors cited per function).
  */
object Extractors {

  private val Ws = "\\s+".r

  /** Whitespace normalization — the reference's `' '.join(s.split())`
    * (`procedure_code.py:70,82,108`). */
  def normWs(s: String): String = Ws.replaceAllIn(s, " ").trim

  /** Strip tags and normalize whitespace (BeautifulSoup `.text` analog). */
  def textOf(html: String): String =
    normWs(html.replaceAll("(?s)<script.*?</script>", "")
      .replaceAll("(?s)<[^>]*>", " "))

  /** First regex group match in the html, if any. */
  private def find(html: String, pattern: String): Option[String] =
    pattern.r.findFirstMatchIn(html).map(_.group(1))

  /** Inner HTML of the element whose opening tag matches `openTag` —
    * *depth-balanced*: nested same-name tags are tracked so a container
    * holding child divs yields its full inner HTML (a non-greedy
    * `(.*?)</div>` would stop at the first child's close).
    */
  private def balancedInner(html: String, openTag: String): Option[String] =
    openTag.r.findFirstMatchIn(html).flatMap { m =>
      val tag = "<([a-zA-Z0-9]+)".r.findFirstMatchIn(m.matched).map(_.group(1)).getOrElse("div")
      val tokens = s"(?s)<$tag\\b[^>]*>|</$tag>".r
      var depth = 1
      var endIdx = -1
      val it = tokens.findAllMatchIn(html.substring(m.end))
      while (endIdx < 0 && it.hasNext) {
        val t = it.next()
        if (t.matched.startsWith("</")) { depth -= 1; if (depth == 0) endIdx = m.end + t.start }
        else depth += 1
      }
      if (endIdx >= 0) Some(html.substring(m.end, endIdx)) else None
    }

  private def divByClass(html: String, cls: String): Option[String] =
    balancedInner(html, s"""(?s)<div[^>]*class="[^"]*\\b$cls\\b[^"]*"[^>]*>""")

  private def byId(html: String, id: String): Option[String] =
    balancedInner(html, s"""(?s)<(?:div|table|span)[^>]*id="$id"[^>]*>""")

  /** Inner HTML of every div whose class list contains ALL of `classes`,
    * in document order (BeautifulSoup `find_all` order — parents before
    * children), depth-balanced.
    */
  private def allDivsByClasses(html: String, classes: Seq[String]): Seq[String] = {
    val classLookaheads = classes.map(c => s"""(?=[^"]*\\b$c\\b)""").mkString
    val open = (s"""(?s)<div[^>]*class="$classLookaheads[^"]*"[^>]*>""").r
    open.findAllMatchIn(html).flatMap { m =>
      balancedInner(html.substring(m.start), open.pattern.pattern)
    }.toSeq
  }

  /** Inner HTML of every div, document order, depth-balanced. */
  private def allDivs(html: String): Seq[String] = {
    val open = "(?s)<div\\b[^>]*>".r
    open.findAllMatchIn(html).flatMap { m =>
      balancedInner(html.substring(m.start), "(?s)<div\\b[^>]*>")
    }.toSeq
  }

  // ---- E1/E2/E6-ish page predicates (procedure_code.py:53-58) ----------

  /** E1: `div.container404` exists (`:53-54`). */
  def isError404Page(html: String): Boolean =
    s"""class="[^"]*\\bcontainer404\\b""".r.findFirstIn(html).isDefined

  /** E2: `<h1>` contains "Deleted HCPCS Codes" (`:56-58`). */
  def isDeletedHcpcsPage(html: String): Boolean =
    find(html, "(?s)<h1[^>]*>(.*?)</h1>").exists(_.contains("Deleted HCPCS Codes"))

  /** Deleted-code marker: a `<span>` matching `\bDeleted\b` case-insens.
    * (`:62`). */
  def isDeletedCode(html: String): Boolean =
    "(?s)<span[^>]*>[^<]*</span>".r.findAllIn(html)
      .exists(s => "(?i)\\bDeleted\\b".r.findFirstIn(textOf(s)).isDefined)

  // ---- E3: deleted-branch fields (procedure_code.py:60-111) ------------

  /** Free-text deletion date from the `alert alert-danger` div (`:66-70`). */
  def getDateDeleted(html: String): Option[String] =
    allDivsByClasses(html, Seq("alert", "alert-danger")).headOption
      .map(textOf).filter(_.nonEmpty)

  /** Deleted-page advice (`:72-82`): the FIRST div in document order
    * whose text contains "Advice:" (the reference scans every div —
    * outermost containers first, quirk preserved); prefer that div's
    * first `<p>` text, else the text after "Advice:".
    */
  def getDeletedAdvice(html: String): Option[String] =
    allDivs(html).find(d => textOf(d).contains("Advice:")).map { d =>
      find(d, "(?s)<p[^>]*>(.*?)</p>") match {
        case Some(p) => textOf(p)
        case None =>
          val t = textOf(d)
          val i = t.indexOf("Advice:")
          if (i >= 0) t.substring(i + "Advice:".length).trim else t.trim
      }
    }.map(normWs).filter(_.nonEmpty)

  /** Deleted-page lay term (`:84-90`): among `panel-body tab-pane` divs,
    * the first whose text contains BOTH "The provider administers the
    * first dose" and "COVID–19" (en dash — the reference's COVID-specific
    * match, quirk preserved).
    */
  def getDeletedLayTerm(html: String): Option[String] =
    allDivsByClasses(html, Seq("panel-body", "tab-pane")).map(textOf)
      .find(t => t.contains("The provider administers the first dose")
        && t.contains("COVID–19"))

  /** Deleted-page guidelines (`:92-97`): first `panel-body tab-pane` div
    * containing "Guidelines found", "No CPT", or "No HCPCS".
    */
  def getDeletedGuidelines(html: String): Option[String] =
    allDivsByClasses(html, Seq("panel-body", "tab-pane")).map(textOf)
      .find(t => t.contains("Guidelines found") || t.contains("No CPT")
        || t.contains("No HCPCS"))

  /** Deleted-page descriptor (`:99-108`): the `panel panel-default` whose
    * `panel-heading` contains "Code Descriptor"; text of its
    * `panel-body tab-pane`.
    */
  def getDeletedDescription(html: String): Option[String] =
    allDivsByClasses(html, Seq("panel", "panel-default")).collectFirst {
      case panel if divByClass(panel, "panel-heading").exists(_.contains("Code Descriptor")) =>
        allDivsByClasses(panel, Seq("panel-body", "tab-pane")).headOption.map(textOf)
    }.flatten.filter(_.nonEmpty)

  /** E3 composite (`:60-111`): the 5-tuple, or None when the page has no
    * Deleted span marker.
    */
  def getDeleted(html: String): Option[(Option[String], Option[String],
      Option[String], Option[String], Option[String])] =
    if (!isDeletedCode(html)) None
    else Some((getDateDeleted(html), getDeletedAdvice(html),
      getDeletedLayTerm(html), getDeletedGuidelines(html),
      getDeletedDescription(html)))

  // ---- E4/E5: descriptions (procedure_code.py:113-136) -----------------

  /** E4: `div.layout2_code > h1` text; the part after the first comma,
    * trimmed (`:113-125` — `h1.split(',', 1)[1]`). Falls back to the full
    * h1 text when no comma.
    */
  def getShortDescription(html: String): Option[String] =
    divByClass(html, "layout2_code")
      .flatMap(d => find(d, "(?s)<h1[^>]*>(.*?)</h1>"))
      .map(textOf)
      .map { t =>
        val i = t.indexOf(',')
        if (i >= 0) t.substring(i + 1).trim else t
      }
      .filter(_.nonEmpty)

  /** E5: `div.sub_head_detail` (or `h2.sub_head_detail`) text (`:127-136`). */
  def getLongDescription(html: String): Option[String] =
    divByClass(html, "sub_head_detail")
      .orElse(find(html, s"""(?s)<h2[^>]*class="[^"]*\\bsub_head_detail\\b[^"]*"[^>]*>(.*?)</h2>"""))
      .map(textOf).filter(_.nonEmpty)

  // ---- E6/E7: breadcrumbs + code range (procedure_code.py:138-186) -----

  /** E6: breadcrumb trail texts from `div.newbread` anchors (`:138-163`). */
  def getMainIntervalName(html: String): Option[Seq[String]] =
    divByClass(html, "newbread").map { d =>
      "(?s)<a[^>]*>(.*?)</a>".r.findAllMatchIn(d)
        .map(m => textOf(m.group(1))).filter(_.nonEmpty).toSeq
    }.filter(_.nonEmpty)

  /** E7: code range from the breadcrumb href — CPT `(\d{4,5}T?-\d{4,5}T?)`
    * (`:174-177`) or HCPCS `([A-Z]\d{4}-[A-Z]\d{4})` (`:182-185`).
    */
  def getMainInterval(html: String, isCpt: Boolean): Option[String] =
    if (isCpt) find(html, "(\\d{4,5}T?-\\d{4,5}T?)")
    else find(html, "([A-Z]\\d{4}-[A-Z]\\d{4})")

  // ---- E8: modifiers table (procedure_code.py:188-205) -----------------

  /** E8: rows of `div.modcross_list` table → (modifier, description)
    * pairs plus the bare modifier code list (`:188-205`).
    */
  def getModifierRows(html: String): Seq[(String, String)] =
    find(html, s"""(?s)<div[^>]*class="[^"]*\\bmodcross_list\\b[^"]*"[^>]*>(.*?)</table>""")
      .map { tbl =>
        "(?s)<tr[^>]*>(.*?)</tr>".r.findAllMatchIn(tbl).flatMap { tr =>
          val cells = "(?s)<td[^>]*>(.*?)</td>".r.findAllMatchIn(tr.group(1))
            .map(m => textOf(m.group(1))).toSeq
          if (cells.length >= 2) Some((cells.head, cells(1))) else None
        }.toSeq
      }.getOrElse(Nil)

  // ---- E9: BETOS (procedure_code.py:207-226) ---------------------------

  /** E9: (betos_code, betos_description) from the BETOS tab pane —
    * `Code:`/`Description:` strongs (`:207-226`, incl. the `Code:`-prefix
    * strip at `:222-224`).
    */
  def getBetos(html: String): (Option[String], Option[String]) = {
    val pane = byId(html, "cpt_betos").orElse(byId(html, "hcpcs_betos")).getOrElse(html)
    val code = find(pane, "(?s)Code:\\s*</strong>([^<]*)")
      .orElse(find(pane, "(?s)Code:([^<]*)")).map(normWs).filter(_.nonEmpty)
    val desc = find(pane, "(?s)Description:\\s*</strong>([^<]*)")
      .orElse(find(pane, "(?s)Description:([^<]*)")).map(normWs).filter(_.nonEmpty)
    (code.map(_.stripPrefix("Code:").trim), desc)
  }

  // ---- E10/E11/E13: simple tab panes (procedure_code.py:228-245,295-302)

  private def tabText(html: String, ids: Seq[String]): Option[String] =
    ids.iterator.flatMap(id => byId(html, id)).map(textOf).find(_.nonEmpty)

  /** E10: guidelines pane text (`:228-236`). */
  def getGuidelines(html: String): Option[String] =
    tabText(html, Seq("cpt_guidelines", "hcpcs_guidelines"))

  /** E11: advice pane text (`:238-245`). */
  def getAdvice(html: String): Option[String] =
    tabText(html, Seq("cpt_advice", "hcpcs_advice"))

  /** E13: report pane text (`:295-302`). */
  def getReport(html: String): Option[String] =
    tabText(html, Seq("cpt_report", "hcpcs_report"))

  // ---- E12: lay term (procedure_code.py:247-293) -----------------------

  /** E12: (summary, lay_term) from `#fullLayterm`: summary is the first
    * `<p>`; lay_term is the pane text with the "Read Less" node removed
    * and a trailing "read less" suffix stripped (`:269-289`).
    *
    * JS-degradation contract (VERDICT r16 #7, see [[graft.pipeline.HttpPageFetcher]]):
    * the reference CLICKS "Read More" in a browser before capture
    * (`procedure_code.py:247-293`); a plain-HTTP capture can arrive
    * still collapsed. Both "Read More" and "Read Less" anchors are
    * therefore stripped — a collapsed pane degrades to its truncated
    * text (no UI artifact leaks into the data), and an empty JS-shell
    * pane falls through to the absent branch (None), never a
    * mis-extraction.
    */
  def getLayTerm(html: String): (Option[String], Option[String]) = {
    val pane = byId(html, "fullLayterm").orElse(byId(html, "hcpcs_layterm"))
    val summary = pane.flatMap(p => find(p, "(?s)<p[^>]*>(.*?)</p>")).map(textOf).filter(_.nonEmpty)
    val lay = pane.map { p =>
      // alternation is anchored per word — ([Ll]ess|[Mm]ore), NOT a
      // [LlMm](ess|ore) cross-product that would also strip a legitimate
      // "Read Lore" content link (ADVICE r17)
      val noReadToggle = p.replaceAll("""(?s)<a[^>]*>[^<]*[Rr]ead (?:[Ll]ess|[Mm]ore)[^<]*</a>""", "")
      val t = textOf(noReadToggle)
      val lower = t.toLowerCase
      if (lower.endsWith("read less")) t.substring(0, t.length - "read less".length).trim
      else if (lower.endsWith("read more")) t.substring(0, t.length - "read more".length).trim
      else t
    }.filter(_.nonEmpty)
    (summary, lay)
  }

  // ---- E14: revenue lookup (procedure_code.py:304-341) -----------------

  private def pointsTable(pane: String): Option[String] =
    balancedInner(pane, """(?s)<table[^>]*class="[^"]*\bpoints_table\b[^"]*"[^>]*>""")

  /** E14: revenue codes from `#cpt_revenue_cross > table.points_table`
    * first-column cells, header row skipped (`rows[1:]`, `:325`).
    * Distinguishes "Data Not Available" → None (`:317-319`), missing
    * table → None (`:335`), and empty extraction → Some(Nil) (`:332`).
    */
  def getRevenueCodeLookup(html: String): Option[Seq[String]] =
    byId(html, "cpt_revenue_cross").flatMap { pane =>
      if (pane.contains("Data Not Available")) None
      else pointsTable(pane).map(tbl => firstColumnCells(tbl, skipHeader = true))
    }

  private def firstColumnCells(tableHtml: String, skipHeader: Boolean = false): Seq[String] = {
    val rows = "(?s)<tr[^>]*>(.*?)</tr>".r.findAllMatchIn(tableHtml).toSeq
    (if (skipHeader) rows.drop(1) else rows).flatMap { tr =>
      "(?s)<td[^>]*>(.*?)</td>".r.findFirstMatchIn(tr.group(1)).map(m => textOf(m.group(1)))
    }.filter(_.nonEmpty)
  }

  // ---- E15: ICD-10-CM (procedure_code.py:343-403) ----------------------

  /** E15: ICD-10-CM codes across all letter-tab tables, dots stripped
    * (`:397` — `code.replace('.','')`). Fetch captured all tab panes into
    * one html string, so no click loop is needed here.
    */
  def getIcd10Cm(html: String): Option[Seq[String]] = {
    val codes = "(?s)<td[^>]*class=\"[^\"]*\\bicd_code\\b[^\"]*\"[^>]*>(.*?)</td>".r
      .findAllMatchIn(html).map(m => textOf(m.group(1)).replace(".", "")).toSeq
    val fallback =
      if (codes.nonEmpty) codes
      else "\\b([A-TV-Z]\\d{2}\\.[0-9A-Z]{1,4})\\b".r.findAllMatchIn(textOf(html))
        .map(_.group(1).replace(".", "")).toSeq
    if (fallback.isEmpty) None else Some(fallback.distinct)
  }

  // ---- E16: NDC (procedure_code.py:405-445) ----------------------------

  /** E16: rows of the `#ndc` 5-column table → NdcEntry rows + the
    * alternate-id list (`:405-445`).
    */
  def getNdc(html: String): (Seq[String], Seq[graft.schema.NdcEntry]) = {
    val rows = byId(html, "ndc").map { pane =>
      "(?s)<tr[^>]*>(.*?)</tr>".r.findAllMatchIn(pane).flatMap { tr =>
        val cells = "(?s)<td[^>]*>(.*?)</td>".r.findAllMatchIn(tr.group(1))
          .map(m => textOf(m.group(1))).toSeq
        if (cells.length >= 5)
          Some(graft.schema.NdcEntry(cells(0), cells(1), cells(2), cells(3), cells(4)))
        else None
      }.toSeq
    }.getOrElse(Nil)
    (rows.map(_.ndc_alternate_id), rows)
  }

  // ---- E17: ICD-10-PCS (procedure_code.py:447-478) ---------------------

  /** E17: PCS codes from `#pcsdata > table.points_table` tbody rows;
    * empty extraction stays None (`:447-478`, `pcs_codes if pcs_codes
    * else None`).
    */
  def getIcdPcsX(html: String): Option[Seq[String]] =
    byId(html, "pcsdata").flatMap(pointsTable)
      .map(firstColumnCells(_)).filter(_.nonEmpty)

  // ---- E18: CPT symbols (procedure_code.py:480-519) --------------------

  /** E18: symbol "sym: desc" entries from `#cpt_symbol_div` `.icon-dic-o`
    * divs (CPT branch) or the HCPCS box-detail branch (`:480-519`), with
    * the split-once-on-colon of `:493-496,511-515`.
    */
  def getCptCodeSymbols(html: String, isCpt: Boolean): Option[Seq[String]] = {
    val container =
      if (isCpt) byId(html, "cpt_symbol_div")
      else find(html, s"""(?s)<div[^>]*class="[^"]*\\bbox-detail\\b[^"]*"[^>]*>(.*?)$$""")
    container.map { c =>
      "(?s)<div[^>]*class=\"[^\"]*\\bicon-dic-o\\b[^\"]*\"[^>]*>(.*?)</div>".r
        .findAllMatchIn(c)
        // HCPCS branch strips <img> tags before reading text (`:509-510`)
        .map(m => textOf(m.group(1).replaceAll("(?s)<img[^>]*>", "")))
        // split-once on colon; entries WITHOUT a colon are dropped
        // (`parts = split(':', 1); if len(parts) == 2`, `:496,515`)
        .flatMap { t =>
          val i = t.indexOf(':')
          if (i >= 0) Some(t.substring(i + 1).trim).filter(_.nonEmpty) else None
        }.toSeq
    }.filter(_.nonEmpty)
  }

  // ---- E19: official descriptor (procedure_code.py:521-538) ------------

  /** E19: descriptor from the `Code Descriptor` panel (`:521-538`). */
  def getOfficialDescriptor(html: String): Option[String] =
    find(html, "(?s)Code Descriptor(?:</[^>]+>)?(.*?)</div>").map(textOf).filter(_.nonEmpty)

  // ---- UDF wrappers ----------------------------------------------------

  val shortDescriptionUdf = udf((html: String) =>
    if (html == null) null else getShortDescription(html).orNull)
  /** E8 as a table-valued UDF: rows explode into the modifiers relation. */
  val modifierRowsUdf = udf((html: String) =>
    if (html == null) Seq.empty[graft.schema.Modifier]
    else getModifierRows(html).map { case (m, d) => graft.schema.Modifier(m, d) })
  val longDescriptionUdf = udf((html: String) =>
    if (html == null) null else getLongDescription(html).orNull)
  val is404Udf = udf((html: String) => html != null && isError404Page(html))
  val isDeletedHcpcsUdf = udf((html: String) => html != null && isDeletedHcpcsPage(html))
  /** E16 as a table-valued UDF: NDC rows explode into the child table. */
  val ndcRowsUdf = udf((html: String) =>
    if (html == null) Seq.empty[graft.schema.NdcEntry] else getNdc(html)._2)
  /** E3 composite as a struct UDF: null when the page has no Deleted
    * marker, else the 5 sparse fields.
    */
  val deletedUdf = udf((html: String) =>
    if (html == null) null
    else getDeleted(html).map { case (d, a, l, g, desc) =>
      graft.schema.DeletedFields(d.orNull, a.orNull, l.orNull, g.orNull, desc.orNull)
    }.orNull)
  val mainIntervalUdf = udf((html: String, isCpt: Boolean) =>
    if (html == null) null else getMainInterval(html, isCpt).orNull)
}
