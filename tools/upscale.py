"""Perf-only dataset upscaler: replicate a driver-generated SF with key
offsets to build a larger scale factor for THROUGHPUT curves (SCALING.md
§8c/§8f).  NOT for correctness runs — the driver's generator (seed=42) is
the only source of truth for oracle-checked data; replication preserves
schemas, distributions, and join fan-in ratios, which is all a wall-time
curve needs.

Pure pyarrow (no Spark): each fact table is read once and written REPS
times with entity keys shifted by a per-entity stride (max+1), so every
foreign key keeps resolving and per-key group sizes stay identical to the
source SF.  region/nation (enumeration dims) are copied unchanged.

Usage: python tools/upscale.py [SRC_DIR] [DST_DIR] [REPS]
Defaults: /root/testdata/sf0.1 -> <repo>/.scaledata/sf1.0, REPS=10.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_ONCE = ["region", "nation"]
# table -> {column: stride entity}
SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
STRIDE_SOURCE = {  # entity -> (table, key column) the stride is derived from
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".scaledata", "sf1.0")
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    strides = {}
    for entity, (table, col) in STRIDE_SOURCE.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
        strides[entity] = int(pc.max(t[col]).as_py()) + 1
    print("strides:", strides)

    for name in COPY_ONCE:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(name, "copied", t.num_rows)

    for name, shifts in SHIFTS.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        copies = []
        for i in range(reps):
            c = t
            if i > 0:
                for col, entity in shifts.items():
                    idx = c.schema.get_field_index(col)
                    shifted = pc.add(c[col], i * strides[entity])
                    # keep the exact source dtype (add may upcast)
                    shifted = pc.cast(shifted, t.schema.field(col).type)
                    c = c.set_column(idx, t.schema.field(col), shifted)
                if name == "documents":
                    c = _mark_documents(c, i)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(name, f"x{reps}", out.num_rows)


def _mark_documents(c: pa.Table, i: int) -> pa.Table:
    """Insert a replica-distinct marker token every 5 words (every 2 for
    docs under 10 words, plus one appended to every doc) so replicas are
    NOT near-duplicates of each other (word-shingle Jaccard between marked
    replicas drops well below the 0.5 dedup threshold) while the dup
    structure WITHIN each replica is preserved — pure replication would
    otherwise grow LSH verify pairs ~(reps^2/2)x instead of reps x and
    distort the dedup scale curve.  The short-doc densification matters:
    the original every-5 rule left <=5-word docs IDENTICAL across replicas
    (and 5-word docs at Jaccard 0.6 > the 0.5 threshold), which produced
    1606 cross-replica survivor pairs at sf1.0 — a fixture artifact that
    read as superlinear dedup cost (SCALING.md §8g).  n_chars is
    recomputed to stay consistent with the transformed text."""
    mark = f"zrep{i}z"
    texts = []
    for s in c["text"].to_pylist():
        w = s.split(" ")
        step = 2 if len(w) < 10 else 5
        out_w = []
        for j, tok in enumerate(w):
            if j and j % step == 0:
                out_w.append(mark)
            out_w.append(tok)
        out_w.append(mark)
        texts.append(" ".join(out_w))
    arr = pa.array(texts, type=c.schema.field("text").type)
    c = c.set_column(c.schema.get_field_index("text"), c.schema.field("text"), arr)
    n_chars = pa.array([len(s) for s in texts], type=c.schema.field("n_chars").type)
    return c.set_column(
        c.schema.get_field_index("n_chars"), c.schema.field("n_chars"), n_chars
    )


if __name__ == "__main__":
    main()
