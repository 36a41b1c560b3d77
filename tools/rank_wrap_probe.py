"""One-shot empirical probe: what does Spark's row_number() do past
2^31 rows in a single window partition? (round-10 partitioned-window
sweep — the claim being grounded is that the IntegerType rank counter
cannot count a fact-scaled partition, while DuckDB's BIGINT twin can,
so the divergence is invisible to any fixture-scale gate.)

Feeds 2^31 + 5 rows through ONE window partition ordered by a constant
(every row ties, so the mandatory window sort degenerates to a cheap
constant-key sort — the probe measures the COUNTER, not sort
throughput) and reports min/max/count of the emitted rank. Outcomes:

- non-ANSI Spark: silent wrap — min = -2147483648, max = 2147483647;
- ANSI Spark (4.x default): the internal `rowNumber + 1` Add throws
  ArithmeticException at exactly 2^31 — a hard query failure at
  posture instead of silent corruption (better, still a cliff).

Either outcome justifies the sweep's LONG count-over-frame spelling,
which this probe then validates on the same relation (expected max =
2147483653). Run time is minutes (single task by construction — that
is the point); results are recorded in COVERAGE.md, not asserted in
the unit suite.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from repcheck_data_integration_spark.session import get_spark

N = 2_147_483_653  # 2^31 + 5


def main() -> None:
    spark = get_spark("rank-wrap-probe")
    base = spark.range(0, N, 1, 1).select(F.lit(0).alias("k"))
    w = W.partitionBy("k").orderBy("k")

    t0 = time.time()
    try:
        got = (
            base.select(F.row_number().over(w).alias("rn"))
            .agg(
                F.min("rn").alias("mn"),
                F.max("rn").alias("mx"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        print(
            f"row_number over {N} rows: min={got['mn']} max={got['mx']} "
            f"n={got['n']} ({time.time() - t0:.0f}s)"
        )
        if got["mn"] < 0:
            print("=> SILENT INT WRAP (min went negative)")
        elif got["mx"] == N:
            print("=> no wrap observed (unexpected on a stock build)")
    except Exception as e:  # ANSI overflow surfaces here
        msg = str(e).splitlines()[0][:200]
        print(
            f"row_number over {N} rows: RAISED after "
            f"{time.time() - t0:.0f}s: {msg}"
        )
        print("=> HARD FAILURE at 2^31 (ANSI int-overflow in the counter)")

    t0 = time.time()
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    got = (
        base.select(F.count(F.lit(1)).over(wf).alias("rn"))
        .agg(
            F.min("rn").alias("mn"),
            F.max("rn").alias("mx"),
        )
        .collect()[0]
    )
    print(
        f"count-over-frame over {N} rows: min={got['mn']} max={got['mx']} "
        f"({time.time() - t0:.0f}s)"
    )
    assert got["mx"] == N, "LONG count-over-frame must count exactly"
    print("=> LONG count-over-frame exact past 2^31 (the sweep's spelling)")
    spark.stop()


if __name__ == "__main__":
    main()
