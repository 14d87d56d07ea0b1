#!/usr/bin/env python3
"""Build the non-ASCII oracle-agreement corpus (VERDICT r16 #3): a copy
of an sf dir whose documents table carries genuinely multi-byte UTF-8
text (2-byte é/ü, 3-byte CJK, 4-byte emoji) at doc_ids inside every mm
query's filter range (50 < 100, 150 < 200, 250 < 300), so byte==char
accidents cannot pass. Originals under /root/testdata are never touched.

Usage: python3 tools/make_nonascii_corpus.py [srcSf] [dstDir]
Then:  sbt "runMain graft.Verify <dstDir> /tmp/verify_nonascii mm01... "
       python3 tools/compare_oracle.py <dstDir> /tmp/verify_nonascii mm01...
"""
import shutil, sys, os
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf0.01_nonascii"

# ~700 chars, ~1.3 KB in UTF-8: long enough for mm12's fixed-width-64
# tile grid (needs >= 512 bytes) and mm02/mm09/mm10 frame windows.
BLOCK = ("Ceci n'était qu'un début: héllo wörld, 中文文本与深度学习语料 "
         "données multilingues — ñandú, смысл, 🌍😀 emoji too. ")
NON_ASCII = (BLOCK * 12).strip()

def main():
    os.makedirs(DST, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copyfile(os.path.join(SRC, f), os.path.join(DST, f))
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    cols = t.to_pydict()
    hit = 0
    for i, did in enumerate(cols["doc_id"]):
        if did in (50, 150, 250):
            # vary per doc so the three rows aren't exact duplicates
            cols["text"][i] = f"doc{did}: " + NON_ASCII
            cols["n_chars"][i] = len(cols["text"][i])
            hit += 1
    assert hit == 3, f"expected doc_ids 50/150/250 present, got {hit}"
    out = pa.table(cols, schema=t.schema.remove_metadata())
    pq.write_table(out, os.path.join(DST, "documents.parquet"))
    sample = cols["text"][[i for i, d in enumerate(cols["doc_id"]) if d == 50][0]]
    print(f"wrote {DST}: 3 non-ASCII rows, chars={len(sample)} "
          f"bytes={len(sample.encode('utf-8'))}")

if __name__ == "__main__":
    main()
