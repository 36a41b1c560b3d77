"""Tests for the shapefile decoder and acquisition utilities."""

from __future__ import annotations

import json
import os
import zipfile

from repcheck_data_integration_spark.sources import acquire
from repcheck_data_integration_spark.sources.shapefile import (
    parse_dbf,
    parse_shp,
    read_shapefile_dir,
    write_shapefile,
)

RECORDS = [
    {"attrs": ["55", "Wisconsin-3"], "ring": [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]},
    {"attrs": ["06", "California-9"], "ring": [[10, 10], [20, 10], [20, 30], [10, 30], [10, 10]]},
]


def _write_fixture(d):
    write_shapefile(os.path.join(d, "tl_test_55"), ["FIPS", "NAME"], RECORDS[:1])
    write_shapefile(os.path.join(d, "tl_test_06"), ["FIPS", "NAME"], RECORDS[1:])


def test_parse_roundtrip(tmp_path):
    _write_fixture(tmp_path)
    stem = str(tmp_path / "tl_test_55")
    with open(stem + ".shp", "rb") as f:
        shapes = parse_shp(f.read())
    with open(stem + ".dbf", "rb") as f:
        names, recs = parse_dbf(f.read())
    assert names == ["FIPS", "NAME"]
    assert recs == [["55", "Wisconsin-3"]]
    assert shapes[0]["geometry"]["type"] == "Polygon"
    assert shapes[0]["bbox"] == (0.0, 0.0, 4.0, 4.0)
    assert shapes[0]["geometry"]["coordinates"][0][1] == [4.0, 0.0]


def test_read_shapefile_dir_distributed(spark, tmp_path):
    """The per-state file layout of the reference (one task per .shp)."""
    _write_fixture(tmp_path)
    df = read_shapefile_dir(
        spark, str(tmp_path / "*.shp"), field_names=["fips", "name"]
    )
    rows = {r["fips"]: r for r in df.collect()}
    assert set(rows) == {"55", "06"}
    assert rows["06"]["xmax"] == 20.0 and rows["06"]["ymax"] == 30.0
    assert rows["55"]["n_points"] == 5
    geom = json.loads(rows["55"]["geometry"])
    assert geom["coordinates"][0][0] == [0.0, 0.0]


def test_http_fetch_file_url_and_zip(tmp_path):
    payload = tmp_path / "payload.txt"
    payload.write_bytes(b"x" * 1000)
    archive = tmp_path / "a.zip"
    with zipfile.ZipFile(archive, "w") as z:
        z.write(payload, "payload.txt")
    dest = str(tmp_path / "dl" / "a.zip")
    got = acquire.http_fetch(archive.as_uri(), dest)
    assert got == dest and os.path.getsize(dest) > 0
    names = acquire.extract_zip(dest, str(tmp_path / "out"))
    assert names and open(names[0], "rb").read() == b"x" * 1000


def test_git_clone_local(tmp_path):
    dest = str(tmp_path / "clone")
    got = acquire.git_clone("/root/repo", dest)
    assert os.path.isdir(os.path.join(got, ".git"))
    # idempotent: second call reuses the checkout
    assert acquire.git_clone("/root/repo", dest) == dest


def test_csv_json_roundtrip_nasty_strings(spark, tmp_path):
    """Quoting/escaping fidelity: commas, quotes, newlines, unicode and
    empty strings must survive the csv and json write→read roundtrips."""
    rows = [
        (1, 'comma, inside'),
        (2, 'quote " inside'),
        (3, 'newline\ninside'),
        (4, 'unicode é漢字 ok'),
        (5, ''),
        (6, None),
        (7, ' leading and trailing '),
    ]
    df = spark.createDataFrame(rows, ["id", "s"])
    csv_opts = {
        "header": True,
        "multiLine": True,
        # Spark's csv WRITER trims by default — disable to preserve padding
        "ignoreLeadingWhiteSpace": False,
        "ignoreTrailingWhiteSpace": False,
    }
    for fmt, extra in (("csv", csv_opts), ("json", {})):
        out = str(tmp_path / fmt)
        w = df.coalesce(1).write.mode("overwrite")
        r = spark.read.schema("id long, s string")
        for k, v in extra.items():
            w = w.option(k, v)
            r = r.option(k, v)
        getattr(w, fmt)(out)
        back = sorted(
            ((x["id"], x["s"]) for x in getattr(r, fmt)(out).collect()),
        )
        expected = sorted(rows)
        if fmt == "csv":
            # csv cannot distinguish null from empty string; normalize both
            back = [(i, s or None) for i, s in back]
            expected = [(i, s or None) for i, s in expected]
        assert back == expected, fmt


def test_malformed_json_permissive_vs_failfast(spark, tmp_path):
    """Engine error-handling surface: PERMISSIVE mode quarantines corrupt
    records into _corrupt_record (the dead-letter pattern for 100 TB
    ingest, where one bad row must not kill a 6-hour job); FAILFAST
    surfaces them as hard errors (the reference's fail-fast preference)."""
    import pytest
    from pyspark.sql import functions as F

    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "{this is not json}\n"
        '{"id": 3, "v": "also ok"}\n'
    )
    schema = "id long, v string, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 3}
    assert len(bad) == 1 and "{this is not json}" in bad[0]["_corrupt_record"]

    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        (
            spark.read.schema("id long, v string")
            .option("mode", "FAILFAST")
            .json(str(p))
            .collect()
        )


def test_malformed_csv_permissive_nulls(spark, tmp_path):
    """CSV with a type-mismatched cell: PERMISSIVE yields null for the bad
    cell instead of failing the scan."""
    p = tmp_path / "mixed.csv"
    p.write_text("id,val\n1,10.5\n2,not_a_number\n3,7.25\n")
    df = (
        spark.read.option("header", True)
        .schema("id long, val double")
        .option("mode", "PERMISSIVE")
        .csv(str(p))
    )
    got = {r["id"]: r["val"] for r in df.collect()}
    assert got[1] == 10.5 and got[3] == 7.25 and got[2] is None
