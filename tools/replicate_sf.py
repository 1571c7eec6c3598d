"""Replicate a testdata SF directory N× with disjoint key offsets — the
SCALING.md methodology, reproducible. Dimension tables (region, nation) stay
single-copy; every surrogate key is offset by replica*1e6 so per-key
cardinalities (symbols = l_suppkey, users, docs, vectors) scale with N while
per-key history length stays constant — a pure scale-OUT of the key space,
which is what a bigger cluster sees.

Usage: python tools/replicate_sf.py [src_sf_dir] [dst_dir] [n]
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 1_000_000

KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf0.5"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        path = os.path.join(src, f"{table}.parquet")
        out = os.path.join(dst, f"{table}.parquet")
        if not keys:
            con.execute(
                f"COPY (SELECT * FROM '{path}') TO '{out}' (FORMAT PARQUET)"
            )
            print(f"{table}: copied")
            continue
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        parts = []
        for r in range(n):
            sel = ", ".join(
                f"{c} + {r * OFF} AS {c}" if c in keys else c for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{path}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}' (FORMAT PARQUET)"
        )
        rows = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {rows} rows ({n}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
