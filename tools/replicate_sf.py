"""Replicate a testdata SF directory N× with disjoint key offsets — the
SCALING.md methodology, reproducible. Dimension tables (region, nation) stay
single-copy; every surrogate key is offset by replica*1e6 so per-key
cardinalities (symbols = l_suppkey, users, docs, vectors) scale with N while
per-key history length stays constant — a pure scale-OUT of the key space,
which is what a bigger cluster sees.

``--perturb`` additionally rewrites ``documents.text`` in replica r>0 by
suffixing every non-empty token with a replica-specific alphabetic tag
(a bijection on the vocabulary): each
replica becomes a fresh corpus with the same intra-corpus statistics —
same token-frequency shape, same near-dup pair structure — but ZERO
token overlap across replicas — and rewrites ``embeddings.embedding``
in replica r>0 by a per-replica deterministic SIGNED PERMUTATION of the
64 dimensions (an orthogonal transform: intra-replica distances and
cosines are EXACTLY preserved, cross-replica similarity is destroyed —
the sign flips cover the vectors a bare permutation would nearly fix,
ADVICE r12 item 4), so the vector half of the similarity-join
family gets the same fresh-corpus treatment as the text half. This is
the non-replica scale fixture for the similarity-join family (VERDICT
r8 item 6): with exact copies, a
text self-join's OUTPUT is quadratic in the copy count (every copy of a
dup cluster pairs with every other), which measures the fixture, not the
algorithm; with perturbed replicas the true output grows linearly in N
and the measured runtime isolates candidate-generation scaling.

Usage: python tools/replicate_sf.py [src_sf_dir] [dst_dir] [n] [--perturb]
"""

from __future__ import annotations

import os
import random
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
    perturb = "--perturb" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--perturb"]
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    dst = argv[1] if len(argv) > 1 else "/tmp/spark_graft_sf0.5"
    n = int(argv[2]) if len(argv) > 2 else 5
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
        # the disjoint-key contract silently breaks if any source key
        # reaches OFF (replica 0's top keys collide with replica 1's
        # bottom): refuse rather than produce a fixture whose per-key
        # cardinality quietly stops being constant
        for k in keys:
            mx = con.execute(f"SELECT max({k}) FROM '{path}'").fetchone()[0]
            if mx is not None and mx >= OFF:
                raise SystemExit(
                    f"{table}.{k} max {mx} >= offset {OFF}: replicas would "
                    "collide. Raise OFF for this source scale."
                )
        parts = []
        for r in range(n):
            def render(c: str) -> str:
                if c in keys:
                    return f"{c} + {r * OFF} AS {c}"
                if perturb and table == "documents" and c == "text" and r > 0:
                    # bijective vocab rename per replica: fresh corpus,
                    # identical intra-corpus statistics, zero
                    # cross-replica token overlap. The suffix must be
                    # PURELY ALPHABETIC and replica-specific: the
                    # engine's tokenizer strips [^a-z]+ , so a '_r{r}'
                    # style suffix collapses to the SAME interleaved 'r'
                    # token in every replica — replicas become exact
                    # near-dups again and a similarity self-join's
                    # output explodes quadratically (observed:
                    # 256 -> 17.9M candidates at 5x).
                    alpha = ""
                    k = r
                    while True:
                        alpha = chr(ord("a") + k % 26) + alpha
                        k //= 26
                        if k == 0:
                            break
                    return (
                        "array_to_string(list_transform("
                        # empty tokens (double spaces/newlines) must stay
                        # empty: '' || suffix would inject a NEW bare
                        # high-frequency token per replica, breaking the
                        # identical-intra-corpus-statistics contract
                        f"string_split(text, ' '), "
                        f"x -> CASE WHEN x = '' THEN x ELSE x || 'q{alpha}' END), ' ') "
                        "AS text"
                    )
                if perturb and table == "embeddings" and c == "embedding" and r > 0:
                    # per-replica deterministic signed dimension
                    # permutation (orthogonal: intra-replica geometry
                    # exact). A bare permutation destroys cross-replica
                    # cosine only for zero-mean-ish vectors — a vector
                    # with near-uniform or symmetric components is a
                    # near-fixed-point of any permutation (ADVICE r12
                    # item 4) — so additionally flip the sign of a
                    # per-replica deterministic ~half of the dimensions:
                    # still exactly distance-preserving (IEEE negation
                    # is exact), and constant-vector fixed points are
                    # gone (their image anti-correlates on the flipped
                    # coordinates).
                    dim = con.execute(
                        f"SELECT len(embedding) FROM '{path}' LIMIT 1"
                    ).fetchone()[0]
                    rng = random.Random(r)
                    perm = list(range(1, dim + 1))
                    rng.shuffle(perm)
                    signs = [rng.random() < 0.5 for _ in range(dim)]
                    if not any(signs):  # degenerate draw: force one flip
                        signs[0] = True
                    elems = ", ".join(
                        f"-embedding[{p}]" if s else f"embedding[{p}]"
                        for p, s in zip(perm, signs)
                    )
                    return f"CAST([{elems}] AS FLOAT[]) AS embedding"
                return c
            sel = ", ".join(render(c) for c in cols)
            parts.append(f"SELECT {sel} FROM '{path}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}' (FORMAT PARQUET)"
        )
        rows = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        mark = (
            " perturbed"
            if perturb and table in ("documents", "embeddings")
            else ""
        )
        print(f"{table}: {rows} rows ({n}x{mark})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
