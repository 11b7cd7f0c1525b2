#!/usr/bin/env python3
"""Build a 10x 'extra decade' documents table for the SCALE.md sweep.

Tiles <src>/documents.parquet N times with disjoint doc_id ranges
(copy i shifts ids by i * 10^ceil(log10(max_id+1))), preserving the
driver's cut discipline (batch = top-20% of ids ends up being whole
copies — the realistic recrawl shape where content recurs verbatim).
Other tables are symlinked from <src> so Bench's warm pass still runs.

Usage: make_sfx.py <srcDir> <outDir> [copies=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src, out = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    max_id = pa.compute.max(t["doc_id"]).as_py()
    shift = 10 ** len(str(max_id))
    parts = []
    for i in range(copies):
        ids = pa.compute.add(t["doc_id"], i * shift)
        parts.append(t.set_column(t.schema.get_field_index("doc_id"),
                                  "doc_id", ids))
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(out, "documents.parquet"))
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(src, f), dst)
    print(f"wrote {big.num_rows} rows (shift {shift}) to {out}")


if __name__ == "__main__":
    main()
