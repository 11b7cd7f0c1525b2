#!/usr/bin/env python3
"""Build a 10x 'extra decade' documents+embeddings dir for the
SCALE.md sweep.

documents: tiles <src>/documents.parquet N times with disjoint,
INTERLEAVED doc_id ranges (copy i gets id' = id*N + i). Every word of
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

embeddings: the same interleaved-id tiling with PERTURBED copies —
copy i > 0 adds seeded-RNG uniform noise of ~5% relative L2 (per
element: eps * element-RMS of the source table) so copies are distinct
vectors in the source's cluster structure (labels keep their copy's
value). Verbatim tiling would make every vector's top-k its 9 exact
duplicates at cos=1 — recall audits would degenerate to finding
identity; independent re-synthesis would instead change the cluster
shape the routers/codebooks train on. Perturbed copies preserve
neighborhood structure: the 10-cluster geometry is intact and copy
families are realistic near-dup neighborhoods, while the ADC-scan and
probe-pruning COST terms (the thing the sweep measures) see a true
10x corpus. Deterministic: RNG seeded by the copy index.

Other tables are symlinked from <src> so Bench's warm pass still runs.

Usage: make_sfx.py <srcDir> <outDir> [copies=10]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def tag_copy(texts, i):
    return pa.array(
        [None if t is None else
         " ".join(w + f"~{i}" for w in t.split()) for t in texts],
        type=pa.string())


def tile_documents(src, out, copies):
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
    # bounded row groups: pyarrow's default (1M rows) would put the whole
    # tiled table into ONE row group — Spark then assigns every actual
    # row to the single input split containing the row-group midpoint
    # and the scan "skew" is pure file layout (measured at 100x: 14
    # empty scan tasks + one 13 s task)
    pq.write_table(big, os.path.join(out, "documents.parquet"),
                   row_group_size=20000)
    return big.num_rows


def tile_embeddings(src, out, copies, eps=0.05):
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    rms = float(np.sqrt(np.mean(vecs.astype(np.float64) ** 2)))
    parts = []
    for i in range(copies):
        ids = pa.compute.add(
            pa.compute.multiply(t["vec_id"], copies), i)
        p = t.set_column(t.schema.get_field_index("vec_id"), "vec_id",
                         ids)
        if i > 0:
            rng = np.random.default_rng(i)
            noise = rng.uniform(-eps * rms, eps * rms,
                                vecs.shape).astype(np.float32)
            p = p.set_column(
                p.schema.get_field_index("embedding"), "embedding",
                pa.array(list(vecs + noise),
                         type=t.schema.field("embedding").type))
        parts.append(p)
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(out, "embeddings.parquet"),
                   row_group_size=20000)
    return big.num_rows


def main():
    src, out = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    nd = tile_documents(src, out, copies)
    ne = tile_embeddings(src, out, copies)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f not in (
                "documents.parquet", "embeddings.parquet"):
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                # absolute target: a relative one would resolve against
                # the LINK's directory and dangle for relative <src>
                os.symlink(os.path.abspath(os.path.join(src, f)), dst)
    print(f"wrote {nd} document rows + {ne} embedding rows "
          f"(interleaved x{copies}) to {out}")


if __name__ == "__main__":
    main()
