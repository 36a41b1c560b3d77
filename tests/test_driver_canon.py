"""Driver-canonicalizer compatibility guards.

The driver hashes each query result through a pandas sort
(``DataFrame.sort_values`` over every column). Two result shapes break that
canonicalizer even when the values are perfectly deterministic:

- top-level ARRAY/MAP columns → ``TypeError: unhashable type: 'list'``
  (round-3 emb_normalize / emb_quantize_int8 failures);
- timestamps beyond pandas' ns-datetime range (max 2262-04-11) →
  ``OutOfBoundsDatetime`` (round-3 snk_scd2's 9999-12-31 sentinel).

These tests sweep EVERY registered query's analyzed schema (cheap — no
execution) so no future operator can reintroduce either class.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from repcheck_data_integration_spark import registry
from repcheck_data_integration_spark.operators.temporal import HIGH_DATE

SF = "/root/testdata/sf0.001"


def test_no_query_emits_toplevel_array_or_map(registry_sweep):
    # Schemas come from the shared session-wide registry sweep (conftest
    # registry_sweep — one build of all 439 query frames instead of three;
    # plan-only mode changes checkpoint materialization, never the
    # analyzed schema). A query whose builder now CRASHES would silently
    # vanish from the schema map, so pin that set too.
    registry.load_all_modules()
    assert not registry_sweep["fails"], (
        "query builders crashed during the registry sweep: "
        f"{registry_sweep['fails']}"
    )
    missing = set(registry.QUERIES) - set(registry_sweep["schemas"])
    assert not missing, f"queries not covered by the sweep: {missing}"
    offenders = {}
    for name, schema in registry_sweep["schemas"].items():
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "driver's pandas canonicalizer cannot hash list/map cells — "
        f"serialize these columns (array_join / to_json): {offenders}"
    )


def test_scd2_sentinel_inside_pandas_ns_range():
    high = dt.datetime.fromisoformat(HIGH_DATE.replace(" ", "T"))
    assert high < dt.datetime(2262, 4, 11), (
        "SCD2 open-row sentinel must stay below pandas' ns-datetime max"
    )
