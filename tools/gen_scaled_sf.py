"""Scale the driver's sf0.1 tables up by an integer factor (default 10 →
"sf1.0") for local scaling measurements — the closest local proxy for the
100× claim (VERDICT r3 item 6). The driver testdata is read-only, so the
output goes to /tmp.

Construction: R key-shifted copies of every data-scaled table, FK-consistent
(o_custkey shifts with customer, l_partkey/l_suppkey/l_orderkey with their
parents). Fixed dims (region, nation) copy once. Two tables get a per-copy
transform so that SIMILARITY STRUCTURE scales linearly the way a real
bigger corpus would, instead of quadratically:

- documents: every token of copy i>0 is prefixed `c{i}` — within-copy
  near-dup pairs survive verbatim (Jaccard is prefix-invariant inside a
  copy), cross-copy pairs vanish. 10 identical copies would otherwise turn
  every doc into a 10-clique: 45× the near-dup pairs, not 10×.
- embeddings: copy i's vector is circularly rotated by i — within-copy
  cosine geometry is exactly preserved (rotation is orthogonal on the
  index set), cross-copy cosine decorrelates.

Usage: python tools/gen_scaled_sf.py [R] [src_dir] [dst_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1.0"

# data-scaled tables: primary key + FK columns, each shifted by
# i * (max - min + 1 of its OWN domain in the source) so copies never
# collide (0-based id spaces collide under a bare max shift: with ids
# 0..4999, copy3's doc 0 and copy2's doc 4999 would both land on 14997)
KEYED = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {
        "event_id": "events.event_id",
        "user_id": "events.user_id",
    },
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
FIXED = ["region", "nation"]


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else SRC
    dst = Path(sys.argv[3] if len(sys.argv) > 3 else DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    spans: dict[str, int] = {}
    for spec in KEYED.values():
        for ref in spec.values():
            t, c = ref.split(".")
            if ref not in spans:
                lo, hi = con.execute(
                    f"SELECT min({c}), max({c}) FROM '{src}/{t}.parquet'"
                ).fetchone()
                spans[ref] = hi - lo + 1

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(r):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i} * {spans[keys[c]]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    exprs.append(
                        f"regexp_replace(text, '(\\S+)', 'c{i}\\1', 'g') AS text"
                    )
                elif t == "embeddings" and c == "embedding" and i > 0:
                    k = i % 8
                    exprs.append(
                        f"list_concat(embedding[{k + 1}:], "
                        f"embedding[1:{k}]) AS embedding"
                    )
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}/{t}.parquet' "
            "(FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
