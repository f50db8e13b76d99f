"""Deterministic sf1 synthesis: 10x replication of the driver's sf0.1
tables with key-space shifting and content decorrelation.

The driver generates sf{0.001,0.01,0.1} only; the sf1 endurance bench
(VERDICT r4 directive #3) needs a 10x corpus with the SAME shape but
WITHOUT degenerate artifacts of naive replication:

* every key column shifts by ``rep * 2**30`` so foreign-key joins stay
  consistent inside a replica and never collide across replicas;
* ``region``/``nation`` are fixed-size dimensions (as in TPC-H, where
  they do not scale with SF) — copied once;
* document text is decorrelated across replicas by splicing a
  replica-specific token after every 3rd word: intra-replica near-dup
  structure (what LSH/minhash queries measure) is preserved because two
  similar docs receive the same splice pattern, while cross-replica
  shingle sets share almost nothing — so dup-cluster sizes stay at the
  sf0.1 distribution instead of every doc gaining 9 exact twins (which
  would blow pair queries up quadratically, not 10x);
* embeddings get a small deterministic per-(rep, dim) offset for the
  same reason (top-k neighbor lists would otherwise be 10 copies of the
  same point).

Everything is plain DuckDB SQL over the read-only source dir — no RNG,
no timestamps; re-running produces byte-identical parquet.

Usage::

    python scripts/make_sf1.py [out_dir] [src_dir] [reps]

Defaults: out=/root/repo/testdata_sf1, src=/root/testdata/sf0.1, reps=10.
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 2**30  # per-replica key shift; far above any sf0.1 key

# key columns to shift, per table (all BIGINT in the source schema)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def make(out_dir: str, src_dir: str, reps: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order = true")

    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM '{src_dir}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, keys in SHIFT.items():
        src = f"'{src_dir}/{t}.parquet'"
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.rep * {OFF} AS {c}")
            elif t == "documents" and c == "text":
                # splice ' x{rep}' after every 3rd word for rep > 0:
                # word-shingle sets across replicas become nearly
                # disjoint while intra-replica similarity is untouched
                sel.append(
                    "CASE WHEN r.rep = 0 THEN text ELSE "
                    "array_to_string(list_transform(string_split(text, ' '),"
                    " (w, i) -> CASE WHEN i % 3 = 0 THEN"
                    " w || ' x' || CAST(r.rep AS VARCHAR) ELSE w END),"
                    " ' ') END AS text"
                )
            elif t == "documents" and c == "n_chars":
                sel.append("0 AS _n_chars_placeholder")
            elif t == "embeddings" and c == "embedding":
                # +-0.02 deterministic per-(rep, dim) jitter; rep 0
                # exact. The vectors are unit-norm with |x| ~ 0.1 per
                # dim, so +-0.02 (L2 shift ~0.09) breaks exact
                # duplication without moving a point out of its label
                # cluster
                sel.append(
                    "CASE WHEN r.rep = 0 THEN embedding ELSE "
                    "list_transform(embedding, (x, i) -> CAST(x + "
                    "((r.rep * 37 + i * 11) % 101 - 50) * 0.0004 "
                    "AS FLOAT)) END AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"SELECT {', '.join(sel)} FROM {src}, "
            f"(SELECT unnest(generate_series(0, {reps - 1})) AS rep) r "
            f"ORDER BY r.rep"
        )
        if t == "documents":
            # n_chars tracks the (possibly spliced) text, like the source
            q = (
                f"SELECT doc_id, text, lang, source, "
                f"CAST(length(text) AS BIGINT) AS n_chars FROM ({q})"
            )
        con.execute(f"COPY ({q}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t:12s} {n:>10,} rows")

    for t in COPY_ONCE:
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t:12s} {n:>10,} rows (dimension, copied once)")
    con.close()


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make(out, src, reps)
