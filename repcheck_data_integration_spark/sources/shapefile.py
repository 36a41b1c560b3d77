"""Shapefile source (SURVEY.md §2.1 src_shapefile_scan).

Reference: /root/reference/scripts/census/zip_codes.py:49-81 reads TIGER/Line
shapefiles with pyshp on the driver, one record at a time, addressing DBF
fields positionally. pyshp isn't in this container, so the decode is a
minimal pure-Python reader for the public ESRI shapefile spec (.shp
geometry: Point/Polygon; .dbf dBase III attributes) — enough for the
TIGER-like inputs the reference consumes.

Distributed shape: `binaryFile` scan over the .shp files (one task per
file — shapefiles are per-state, matching the reference's FIPS-file
partitioning), the sibling .dbf loaded inside the task, records emitted as
named columns + GeoJSON geometry + materialized bbox struct for join
pruning (SURVEY §1.2). Positional DBF access becomes named columns at
ingest.
"""

from __future__ import annotations

import json
import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SHAPE_POINT = 1
SHAPE_POLYGON = 5


# -- pure-python parsers (ESRI shapefile whitepaper / dBase III layout) -----

def parse_shp(data: bytes) -> list[dict]:
    """.shp → list of {shape_type, geometry(dict), bbox(tuple)}."""
    (code,) = struct.unpack(">i", data[0:4])
    if code != 9994:
        raise ValueError("not a shapefile (bad magic)")
    out = []
    pos = 100
    while pos < len(data):
        (_recno, length_words) = struct.unpack(">ii", data[pos : pos + 8])
        content = data[pos + 8 : pos + 8 + length_words * 2]
        pos += 8 + length_words * 2
        (stype,) = struct.unpack("<i", content[0:4])
        if stype == SHAPE_POINT:
            x, y = struct.unpack("<dd", content[4:20])
            out.append(
                {
                    "shape_type": stype,
                    "geometry": {"type": "Point", "coordinates": [x, y]},
                    "bbox": (x, y, x, y),
                }
            )
        elif stype == SHAPE_POLYGON:
            xmin, ymin, xmax, ymax = struct.unpack("<4d", content[4:36])
            n_parts, n_points = struct.unpack("<ii", content[36:44])
            parts = struct.unpack(f"<{n_parts}i", content[44 : 44 + 4 * n_parts])
            pts_off = 44 + 4 * n_parts
            pts = struct.unpack(
                f"<{2 * n_points}d", content[pts_off : pts_off + 16 * n_points]
            )
            coords = [[pts[2 * i], pts[2 * i + 1]] for i in range(n_points)]
            rings = [
                coords[parts[i] : (parts[i + 1] if i + 1 < n_parts else n_points)]
                for i in range(n_parts)
            ]
            out.append(
                {
                    "shape_type": stype,
                    "geometry": {"type": "Polygon", "coordinates": rings},
                    "bbox": (xmin, ymin, xmax, ymax),
                }
            )
        else:
            raise ValueError(f"unsupported shape type {stype}")
    return out


def parse_dbf(data: bytes) -> tuple[list[str], list[list[str]]]:
    """.dbf → (field_names, records-as-trimmed-strings)."""
    n_records, header_size, record_size = struct.unpack("<IHH", data[4:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        desc = data[pos : pos + 32]
        name = desc[0:11].split(b"\x00")[0].decode("ascii")
        length = desc[16]
        fields.append((name, length))
        pos += 32
    records = []
    for i in range(n_records):
        rec = data[header_size + i * record_size :][:record_size]
        if rec[0:1] == b"*":  # deleted
            continue
        vals, off = [], 1
        for _name, length in fields:
            vals.append(rec[off : off + length].decode("ascii").strip())
            off += length
        records.append(vals)
    return [f[0] for f in fields], records


# -- writer (test fixtures only; the engine never writes shapefiles) --------

def write_shapefile(path_stem: str, fields: list[str], records: list[dict]) -> None:
    """Minimal .shp/.dbf writer for polygon fixtures: records are
    {attrs: [str...], ring: [[x, y]...]} (ring closed)."""
    shp_records = []
    for i, r in enumerate(records):
        ring = r["ring"]
        xs, ys = [p[0] for p in ring], [p[1] for p in ring]
        content = struct.pack("<i4dii", SHAPE_POLYGON, min(xs), min(ys), max(xs),
                              max(ys), 1, len(ring))
        content += struct.pack("<i", 0)
        for x, y in ring:
            content += struct.pack("<dd", x, y)
        shp_records.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
    body = b"".join(shp_records)
    total_words = (100 + len(body)) // 2
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0) + struct.pack(
        ">i", total_words
    ) + struct.pack("<ii", 1000, SHAPE_POLYGON) + struct.pack("<8d", 0, 0, 0, 0,
                                                              0, 0, 0, 0)
    with open(path_stem + ".shp", "wb") as f:
        f.write(header + body)

    flen = 32
    field_descs = b""
    for name in fields:
        field_descs += name.encode("ascii")[:11].ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([flen]) + b"\x00" * 15
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + flen * len(fields)
    hdr = bytes([3, 124, 1, 1]) + struct.pack("<IHH", len(records), header_size,
                                              record_size) + b"\x00" * 20
    body = b""
    for r in records:
        body += b" " + b"".join(
            str(v).encode("ascii")[:flen].ljust(flen, b" ") for v in r["attrs"]
        )
    with open(path_stem + ".dbf", "wb") as f:
        f.write(hdr + field_descs + b"\x0d" + body + b"\x1a")


# -- distributed source ------------------------------------------------------

def read_shapefile_dir(
    spark: SparkSession, glob: str, field_names: list[str] | None = None
) -> DataFrame:
    """Distributed shapefile scan: binaryFile over .shp files (one task per
    file), sibling .dbf read within the task, one output row per record:
    named attribute columns + GeoJSON + bbox."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                local = path.removeprefix("file:")
                with open(os.path.splitext(local)[0] + ".dbf", "rb") as f:
                    names, recs = parse_dbf(f.read())
                shapes = parse_shp(bytes(content))
                if len(shapes) != len(recs):
                    raise ValueError(f"{path}: shp/dbf record count mismatch")
                for shape, attrs in zip(shapes, recs):
                    x0, y0, x1, y1 = shape["bbox"]
                    rows.append(
                        {
                            "attrs": attrs,
                            "shape_type": shape["shape_type"],
                            "geometry": json.dumps(shape["geometry"]),
                            "xmin": x0, "ymin": y0, "xmax": x1, "ymax": y1,
                            "n_points": sum(
                                len(r) for r in shape["geometry"]["coordinates"]
                            )
                            if shape["shape_type"] == SHAPE_POLYGON
                            else 1,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["attrs", "shape_type", "geometry", "xmin", "ymin",
                         "xmax", "ymax", "n_points"],
            )

    files = spark.read.format("binaryFile").load(glob)
    raw = files.select("path", "content").mapInPandas(
        decode,
        schema=(
            "attrs array<string>, shape_type int, geometry string,"
            " xmin double, ymin double, xmax double, ymax double, n_points long"
        ),
    )
    if field_names:
        from pyspark.sql import functions as F

        for i, name in enumerate(field_names):
            raw = raw.withColumn(name, F.col("attrs")[i])
        raw = raw.drop("attrs")
    return raw
