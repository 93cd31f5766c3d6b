#!/usr/bin/env python
"""Deterministic sf1.0 scale rung: 10x replication of the driver's sf0.1
tables into REPO/.scratch/sf1.0 (untracked — regenerate on demand).

The driver only ships sf{0.001,0.01,0.1}; the sf1.0 bench tier
(BENCH_r11+ 'sf1_tier' block) needs a 10x-larger input whose PER-QUERY
work profile matches a real 10x scale-up, not an artifact of naive
replication:

* Fact tables replicate with DISJOINT key ranges per replica (group ids,
  order keys, doc/vec ids all offset by replica * (max+1)), so group
  count scales 10x while the group-SIZE distribution — what the
  sequence/funnel engine's cost model keys on — stays exactly the
  driver's. Dimension tables (region, nation) keep their real-world
  cardinality, like TPC-H.
* ``embeddings``: replica r applies a CYCLIC DIMENSION SHIFT
  (e'[i] = e[(i + 7r) mod d]). All within-replica dot products — and
  therefore every ANN/dedup/centroid structure — are preserved exactly;
  corresponding vectors across replicas decorrelate to ~random cosine,
  so near-dup candidate sets scale linearly (10 independent copies of
  the original workload) instead of exploding into 10-deep
  cross-replica duplicate cliques.
* ``documents``: replica r mutates every 5th word with a replica tag.
  Any 5-word shingle contains a mutated word, so MinHash/ngram overlap
  across replicas collapses while exact and near duplicates WITHIN a
  replica transform identically and survive. Same linear-scaling
  argument as embeddings.

Pure pyarrow/numpy — no Spark session, runs in ~a minute. Idempotent:
existing outputs are rewritten.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.1"
REPLICAS = 10

# fact table -> {column: key-space it offsets in}. Key spaces are sized
# from the column's own max+1 so replicas never collide.
OFFSET_COLS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
DIM_TABLES = ["region", "nation"]


def _mutate_text(text: str | None, r: int) -> str | None:
    if r == 0 or text is None:
        return text
    words = text.split(" ")
    tag = f"µ{r}"
    for i in range(0, len(words), 5):
        words[i] = words[i] + tag
    return " ".join(words)


def build(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(f"{src}/{t}.parquet")
              for t in list(OFFSET_COLS) + DIM_TABLES}
    spans = {}
    for t, tbl in tables.items():
        for col in OFFSET_COLS.get(t, {}):
            space = OFFSET_COLS[t][col]
            hi = pa.compute.max(tbl[col]).as_py() or 0
            spans[space] = max(spans.get(space, 0), int(hi) + 1)

    for t in DIM_TABLES:
        pq.write_table(tables[t], f"{dst}/{t}.parquet")

    for t, cols in OFFSET_COLS.items():
        tbl = tables[t]
        out_chunks = []
        emb = None
        if t == "embeddings":
            emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
        docs_text = tbl["text"].to_pylist() if t == "documents" else None
        for r in range(REPLICAS):
            rep = tbl
            for col, space in cols.items():
                shifted = pa.compute.add(rep[col],
                                         pa.scalar(r * spans[space],
                                                   type=rep[col].type))
                rep = rep.set_column(rep.schema.get_field_index(col), col,
                                     shifted.cast(rep[col].type))
            if t == "embeddings" and r > 0:
                rolled = np.roll(emb, 7 * r, axis=1)
                rep = rep.set_column(
                    rep.schema.get_field_index("embedding"), "embedding",
                    pa.array(list(rolled),
                             type=tbl["embedding"].type))
            if t == "documents" and r > 0:
                rep = rep.set_column(
                    rep.schema.get_field_index("text"), "text",
                    pa.array([_mutate_text(x, r) for x in docs_text],
                             type=pa.string()))
            out_chunks.append(rep)
        out = pa.concat_tables(out_chunks)
        pq.write_table(out, f"{dst}/{t}.parquet",
                       row_group_size=1 << 20)
        print(f"{t}: {out.num_rows} rows", flush=True)


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else SRC_DEFAULT
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(here, ".scratch", "sf1.0")
    build(src, dst)
    print(f"wrote {dst}")
