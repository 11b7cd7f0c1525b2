#!/usr/bin/env python3
"""Build a 10x 'extra decade' documents table for the SCALE.md sweep.

Tiles <src>/documents.parquet N times with disjoint, INTERLEAVED
doc_id ranges (copy i gets id' = id*N + i). Every word of
copy i > 0 gets a copy tag ("word~i") so copies are DISTINCT content
with identical per-copy statistics — the clean "10x corpus, same
shape" scaling: term/shingle document frequencies per copy match the
source exactly (plain verbatim tiling would instead multiply every
df by N, collapsing df-capped candidate generation and making
incremental retrieval look artificially sub-linear). Ids INTERLEAVE
(id' = id·N + copy) so the driver's top-20% cut selects each copy's
own top-20% — every copy's batch relates to its own old slice exactly
as the source's batch relates to the source's old corpus (a copy-major
id shift would instead make the batch = whole trailing copies, whose
tagged terms never appear in the old lexicon and incremental retrieval
degenerates to zero candidates).
Other tables are symlinked from <src> so Bench's warm pass still runs.

Usage: make_sfx.py <srcDir> <outDir> [copies=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def tag_copy(texts, i):
    return pa.array(
        [None if t is None else
         " ".join(w + f"~{i}" for w in t.split()) for t in texts],
        type=pa.string())


def main():
    src, out = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    texts = t["text"].to_pylist()
    parts = []
    for i in range(copies):
        ids = pa.compute.add(
            pa.compute.multiply(t["doc_id"], copies), i)
        p = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                         ids)
        if i > 0:
            p = p.set_column(p.schema.get_field_index("text"), "text",
                             tag_copy(texts, i))
        parts.append(p)
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(out, "documents.parquet"))
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                # absolute target: a relative one would resolve against
                # the LINK's directory and dangle for relative <src>
                os.symlink(os.path.abspath(os.path.join(src, f)), dst)
    print(f"wrote {big.num_rows} rows (interleaved x{copies}) to {out}")


if __name__ == "__main__":
    main()
