#!/usr/bin/env python3
"""One-shot maintainability refactor (VERDICT r16 #8): split the
monolithic graft.queries.Catalog object (11k+ LoC) into per-family
trait files with ZERO semantic change.

Mechanics:
- Segment Catalog.scala into top-level members (2-space-indented
  `private val/def ...`), each with its contiguous leading comments.
- Q-vals (`private val <name> = Q(`) classify by name prefix:
    q*   -> CatalogCore        dd*  -> CatalogDedup
    ann* -> CatalogAnn         tx*  -> CatalogText
    mm*  -> CatalogMultimodal  ref* -> CatalogExtract
    dp*  -> CatalogPipeline
- Every other member (helpers, shared CTE strings) hoists into trait
  CatalogShared with `protected` visibility, original order preserved —
  trait linearization initializes CatalogShared's vals before any
  family trait's, so Q SQL built from helper vals at init still works.
- Catalog.scala shrinks to the object extending all traits, with
  `val all` concatenating per-family lists (same 254 names).

Run: python3 tools/split_catalog.py  (in-repo, writes src files)
"""
import re, os, sys

SRC = "src/main/scala/graft/queries/Catalog.scala"
OUT = "src/main/scala/graft/queries"

FAMILIES = [  # (regex on val name, trait, file)
    (re.compile(r"^q\d"), "CatalogCore"),
    (re.compile(r"^dd\d"), "CatalogDedup"),
    (re.compile(r"^ann\d"), "CatalogAnn"),
    (re.compile(r"^tx\d"), "CatalogText"),
    (re.compile(r"^mm\d"), "CatalogMultimodal"),
    (re.compile(r"^ref\d"), "CatalogExtract"),
    (re.compile(r"^dp\d"), "CatalogPipeline"),
]

MEMBER_RE = re.compile(r"^  (private (val|def)|val|def) ")
QVAL_RE = re.compile(r"^  private val (\w+) = Q\(")


def classify(name):
    for rx, trait in FAMILIES:
        if rx.match(name):
            return trait
    return None


def main():
    text = open(SRC).read()
    lines = text.split("\n")
    # find the object body: between "object Catalog {" and its closing "}"
    start = next(i for i, l in enumerate(lines) if l.startswith("object Catalog {"))
    header = lines[:start]  # package, imports, Q case class, scaladoc
    assert lines[-1] == "" and lines[-2] == "}", "unexpected tail"
    body = lines[start + 1:-2]

    # segment into chunks: [leading comments][member ... until next member].
    # A run of 2-space-indented comment/blank lines is attached to the NEXT
    # member when one follows (lookahead), else to the current chunk — so a
    # query's doc comment never lands in the previous family's file.
    #
    # Triple-quoted SQL strings are tracked: a line INSIDE a string is
    # never a gap and never a member start (a SQL line like `* sqrt(...)`
    # otherwise reads as a scaladoc continuation and the chunker cuts the
    # string in half — the ivfCos bug).
    in_str = [False] * (len(body) + 1)
    st = False
    for idx, l in enumerate(body):
        in_str[idx] = st
        if l.count('"""') % 2 == 1:
            st = not st

    def is_gap(i):
        if in_str[i]:
            return False
        s = body[i].strip()
        return (s == "" or s.startswith("//") or s.startswith("/*")
                or s.startswith("*"))

    chunks = []  # (name, lines)
    cur, cur_name = [], None
    i, n = 0, len(body)
    while i < n:
        l = body[i]
        if MEMBER_RE.match(l) and not in_str[i]:
            if cur:
                chunks.append((cur_name, cur))
            cur = [l]
            m = QVAL_RE.match(l)
            cur_name = m.group(1) if m else (
                "__ALL__" if l.startswith("  val all") else None)
            i += 1
        elif is_gap(i) and cur:
            j = i
            while j < n and is_gap(j):
                j += 1
            if j < n and MEMBER_RE.match(body[j]) and not in_str[j]:
                chunks.append((cur_name, cur))
                # drop pure trailing blanks, keep comments with next member
                lead = [x for x in body[i:j]]
                m = QVAL_RE.match(body[j])
                cur = lead + [body[j]]
                cur_name = m.group(1) if m else (
                    "__ALL__" if body[j].startswith("  val all") else None)
                i = j + 1
            else:
                cur.extend(body[i:j])
                i = j
        else:
            if cur:
                cur.append(l)
            else:  # stray leading line before any member: unnamed chunk
                cur, cur_name = [l], None
            i += 1
    if cur:
        chunks.append((cur_name, cur))

    per = {t: [] for _, t in FAMILIES}
    shared, all_chunk = [], None
    order = []  # preserve original val order for `all`
    for name, ls in chunks:
        if name == "__ALL__":
            all_chunk = ls
            continue
        trait = classify(name) if name else None
        if trait:
            per[trait].append("\n".join(ls))
            order.append((name, trait))
        else:
            # hoist helpers: private -> protected (trait-visible)
            hoisted = [re.sub(r"^  private (val|def) ", r"  protected \1 ", x)
                       for x in ls]
            shared.append("\n".join(hoisted))

    assert all_chunk is not None, "val all not found"
    # names listed in the original `all` (source of truth for membership)
    all_body = "\n".join(l for l in all_chunk if not l.lstrip().startswith("//"))
    seen = set()
    all_names = []
    for n in re.findall(r"\b(\w+)\b", all_body):
        if classify(n) and n not in seen:
            seen.add(n)
            all_names.append(n)
    declared = {n for n, _ in order}
    missing = [n for n in all_names if n not in declared]
    assert not missing, f"all references undeclared vals: {missing}"

    imports = """package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables
"""

    def listname(trait):
        return trait.replace("Catalog", "").lower() + "Queries"

    docs = {
        "CatalogShared": "Helpers + shared oracle CTE strings every query family uses\n  * (decimal money discipline, table reader, reusable DuckDB CTE blocks).\n  * Initializes FIRST in Catalog's trait linearization, so family Q vals\n  * can bake these vals into their SQL at construction time.",
        "CatalogCore": "Relational surface (q01-q110): the Athena-replacement SQL\n  * queries — scans, joins, aggregations, windows, sketches, graph.",
        "CatalogDedup": "Deduplication family (dd01-dd28): exact, MinHash/SimHash\n  * banded near-dup, substring/winnowing, incremental, semantic.",
        "CatalogAnn": "Similarity/ANN family (ann01-ann27): brute-force truth,\n  * IVF/PQ/SQ8 trained indexes, graph search, recall grading, serving.",
        "CatalogText": "Text-analysis family (tx01-tx38): language-ID, quality,\n  * tokenizers (BPE/unigram), TF-IDF/BM25, classifiers, PII, stats.",
        "CatalogMultimodal": "Multimodal family (mm01-mm12): binary payload plumbing —\n  * frames, tiles, perceptual hash, scoring, segmentation. BYTE\n  * contract: see MultimodalOps' scaladoc.",
        "CatalogExtract": "Reference-extraction family (ref01-ref04): the crawler's\n  * HTML extraction semantics over fixture pages.",
        "CatalogPipeline": "Pipeline-curation family (dp01-dp34): splits, mixtures,\n  * budgets, packing, decontamination, audits.",
    }

    written = []
    for _, trait in FAMILIES:
        fn = f"{OUT}/{trait}.scala"
        names = [n for n, t in order if t == trait]
        in_all = [n for n in all_names if classify(n) == trait]
        body_txt = "\n\n".join(per[trait])
        content = (imports + "\n/** " + docs[trait] + "\n  * Split from the monolithic Catalog object (VERDICT r16 #8) — pure\n  * file move, zero semantic change.\n  */\n"
                   + f"private[queries] trait {trait} extends CatalogShared {{\n\n"
                   + body_txt
                   + f"\n\n  private[queries] def {listname(trait)}: Seq[Q] = Seq(\n    "
                   + ", ".join(in_all) + ")\n}\n")
        open(fn, "w").write(content)
        written.append((fn, len(per[trait]), len(in_all)))

    shared_content = (imports + "\n/** " + docs["CatalogShared"] + "\n  */\nprivate[queries] trait CatalogShared {\n\n"
                      + "\n\n".join(shared) + "\n}\n")
    open(f"{OUT}/CatalogShared.scala", "w").write(shared_content)

    mixins = " with ".join(t for _, t in FAMILIES)
    all_list = " ++ ".join(listname(t) for _, t in FAMILIES)
    new_catalog = ("\n".join(header)
                   + "object Catalog extends " + mixins + " {\n"
                   + "  /** Every registered query, per-family lists concatenated —\n"
                   + "    * same names as the pre-split monolith (VERDICT r16 #8).\n"
                   + "    */\n"
                   + f"  val all: Seq[Q] = {all_list}\n"
                   + "}\n")
    open(SRC, "w").write(new_catalog)

    print("total Q names in all:", len(all_names))
    for fn, nq, na in written:
        print(f"{fn}: {nq} members, {na} in all")
    print("shared helpers:", len(shared))


if __name__ == "__main__":
    main()
