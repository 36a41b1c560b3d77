"""Driver-canonicalization simulator.

The external driver hashes each query result by loading it into pandas and
sorting over every column (`DataFrame.sort_values`), then value-hashing.
Round 3 proved two failure classes live ONLY in that code path (list cells
are unhashable; 9999-12-31 overflows ns-datetime) — invisible to
tools/check.py, which canonicalizes in pure Python. This tool pushes every
driver-window query's FULL sf0.001 result through the same pandas
operations the driver uses, so any cell the driver could choke on fails
here first.

Usage: python tools/driver_sim.py [name ...]   # default: the 50-window
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.001")


def canon(df) -> str:
    """The driver's canonicalization shape: toPandas, sort over every
    column, stringify. Raises exactly where the driver's would."""
    import hashlib

    pdf = df.toPandas()
    if len(pdf.columns):
        pdf = pdf[sorted(pdf.columns)]
        if len(pdf):
            pdf = pdf.sort_values(by=list(pdf.columns))
    body = pdf.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(body.encode()).hexdigest()


def main(names: list[str]) -> int:
    from repcheck_data_integration_spark import registry
    from repcheck_data_integration_spark.session import get_spark

    registry.load_all_modules()
    todo = names or list(registry.ordered_queries())[:50]
    spark = get_spark(
        "driver-sim",
        shuffle_partitions=8,
        # the driver's session shape: NTZ inference left on
        extra_conf={"spark.sql.parquet.inferTimestampNTZ.enabled": "true"},
    )
    n_fail = 0
    for name in todo:
        try:
            h = canon(registry.QUERIES[name](spark, SF))
            print(f"[OK]   {name}: {h[:12]}")
        except Exception as e:
            print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
    print(f"\n{len(todo) - n_fail} ok, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
