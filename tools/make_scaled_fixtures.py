"""Materialize scaled fixtures: /tmp/repcheck_sf{N/10} as N key-shifted
copies of /root/testdata/sf0.1 (round 5 built sf1 this way by hand; this
checks the generator in — VERDICT r5 #1 needs sf10 = 100 copies).

Every entity key shifts by copy_index * 100_000_000 and every FK shifts
with it, so each copy is a disjoint sub-universe: joins stay correct,
selectivities stay constant, and only VOLUME grows. region/nation are
dimensions shared across copies (as in TPC-H, where nation count is
SF-invariant). Text/embedding payloads are exact twins across copies —
the standing dedup caveat from SCALE.md applies to any dedup-family op
run on these fixtures.

Usage: python tools/make_scaled_fixtures.py <factor> [out_dir]
       (factor 10 -> sf1, 100 -> sf10)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHIFT = 100_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    factor = int(sys.argv[1])
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/repcheck_sf{factor / 10:g}"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO"
            f" '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied 1x")
    for t, keys in SHIFT_COLS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        proj = ", ".join(
            f"{c} + i * {SHIFT} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM '{SRC}/{t}.parquet',"
            f" range({factor}) r(i)) TO '{out}/{t}.parquet'"
            f" (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
