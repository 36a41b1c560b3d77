"""Local correctness harness — mimics the driver's DuckDB-oracle compare.

Usage:
    python tools/check.py [name ...]       # default: all registered queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/check.py

For each query: run the Spark plan and the DuckDB oracle, compare
row-count, schema (normalized type names), and an order-insensitive value
hash (columns sorted by name, rows sorted, floats normalized). Strict float
equality is asserted after round(9) normalization — if this passes, any
reasonable driver hash also passes.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 9)
        return repr(r + 0.0)  # -0.0 -> 0.0
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return repr(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [c for c in sorted(cols)], out


def main(names):
    from repcheck_data_integration_spark import registry
    from repcheck_data_integration_spark.session import get_spark

    registry.load_all_modules()
    todo = names or sorted(registry.QUERIES)
    spark = get_spark(
        "check",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CHECK_PARTS", "8")),
    )

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name in todo:
        if name not in registry.QUERIES:
            print(f"[SKIP] {name}: not registered")
            continue
        t0 = time.time()
        try:
            sdf = registry.QUERIES[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in registry.ORACLE:
            print(f"[ROWS] {name}: {len(srows)} rows (no oracle) "
                  f"({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(registry.ORACLE[name])
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            ok = False
            msgs.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if ok:
            _, s_canon = canon_rows(scols, srows)
            _, d_canon = canon_rows(dcols, drows)
            if s_canon != d_canon:
                ok = False
                diff = [
                    (a, b) for a, b in zip(s_canon, d_canon) if a != b
                ][:3]
                msgs.append(f"values differ; first diffs: {diff}")
        if ok:
            print(f"[PASS] {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: " + "; ".join(msgs))
            n_fail += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
