"""Avro Object Container File source (pure-python, distributed).

The reference ingests whatever the upstream agencies publish (CSV / JSON /
shapefile / YAML, scripts/census & scripts/openstates); Avro is the one
row-oriented interchange format large pipelines exchange that Spark's
bundled jars alone can't read (`spark.read.format("avro")` needs the
separate spark-avro connector, absent here). Same play as the shapefile
source (sources/shapefile.py): the format is a public spec (Apache Avro
1.11 specification — Object Container Files), small enough to decode in
pure Python, and the DISTRIBUTION is the part that matters — one task per
file via `binaryFile` + `mapInPandas`, the decode runs executor-side on
Arrow batches, never on the driver.

Supported schema subset: null, boolean, int, long, float, double, string,
bytes, records of those, union[null, X] (nullable columns), array<X> and
map<X> of primitives. Codecs: null and deflate (raw zlib, spec §"Required
Codecs"). Block sync markers are verified; a mismatch fails loudly rather
than resyncing (truncated/corrupt containers surface as errors, not
silently shortened tables).

Scale note: Avro blocks are individually decodable (count, size, payload,
sync), so the natural 100 TB extension is block-granular splits — offset
scan to the next sync marker, exactly how Hadoop's AvroInputFormat splits.
File-granular tasks are honest at fixture scale and keep the reader
dependency-free; the block walk below is already the loop a split reader
needs.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

MAGIC = b"Obj\x01"


# -- binary primitives (Avro spec: zigzag varints, little-endian IEEE) ------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7


def write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def read_bytes(buf) -> bytes:
    n = read_long(buf)
    return buf.read(n)


# -- schema-driven encode/decode -------------------------------------------

def _encode_value(buf: io.BytesIO, schema, v) -> None:
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, list):  # union
        for idx, branch in enumerate(t):
            bt = branch["type"] if isinstance(branch, dict) else branch
            if (v is None) == (bt == "null"):
                write_long(buf, idx)
                if bt != "null":
                    _encode_value(buf, branch, v)
                return
        raise ValueError(f"no union branch for {v!r} in {t}")
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(v))
    elif t == "float":
        buf.write(struct.pack("<f", float(v)))
    elif t == "double":
        buf.write(struct.pack("<d", float(v)))
    elif t == "string":
        write_bytes(buf, str(v).encode("utf-8"))
    elif t == "bytes":
        write_bytes(buf, bytes(v))
    elif t == "record":
        for f in schema["fields"]:
            _encode_value(buf, f["type"], v[f["name"]])
    elif t == "array":
        if v:
            write_long(buf, len(v))
            for item in v:
                _encode_value(buf, schema["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if v:
            write_long(buf, len(v))
            for k, item in v.items():
                write_bytes(buf, str(k).encode("utf-8"))
                _encode_value(buf, schema["values"], item)
        write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


def _decode_value(buf, schema):
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, list):  # union
        idx = read_long(buf)
        branch = t[idx]
        bt = branch["type"] if isinstance(branch, dict) else branch
        return None if bt == "null" else _decode_value(buf, branch)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return read_bytes(buf)
    if t == "record":
        return {
            f["name"]: _decode_value(buf, f["type"]) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec-allowed)
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = _decode_value(buf, schema["values"])
    raise NotImplementedError(f"avro type {t!r}")


# -- container file ---------------------------------------------------------

def _sync_marker(seed: str) -> bytes:
    """Deterministic 16-byte sync marker (md5 of a seed — the spec requires
    only uniqueness per file; determinism keeps fixtures reproducible)."""
    import hashlib

    return hashlib.md5(f"avro_sync_{seed}".encode()).digest()


def write_avro(
    path: str,
    schema: dict,
    rows: list[dict],
    codec: str = "deflate",
    rows_per_block: int = 200,
) -> None:
    """Write an Object Container File: magic, metadata map (avro.schema,
    avro.codec), sync marker, then blocks of (count, size, payload,
    sync)."""
    sync = _sync_marker(os.path.basename(path))
    with open(path, "wb") as f:
        f.write(MAGIC)
        head = io.BytesIO()
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        write_long(head, len(meta))
        for k, v in meta.items():
            write_bytes(head, k.encode())
            write_bytes(head, v)
        write_long(head, 0)
        f.write(head.getvalue())
        f.write(sync)
        for i in range(0, max(len(rows), 1), rows_per_block):
            chunk = rows[i : i + rows_per_block]
            if not chunk:
                break
            payload = io.BytesIO()
            for r in chunk:
                _encode_value(payload, schema, r)
            data = payload.getvalue()
            if codec == "deflate":
                data = zlib.compress(data)[2:-4]  # raw deflate per spec
            elif codec != "null":
                raise NotImplementedError(f"codec {codec}")
            blk = io.BytesIO()
            write_long(blk, len(chunk))
            write_long(blk, len(data))
            f.write(blk.getvalue())
            f.write(data)
            f.write(sync)


def read_avro(data: bytes) -> tuple[dict, list[dict]]:
    """Decode a container file → (schema, rows). Verifies magic and every
    block's sync marker."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode()
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    rows = []
    while True:
        first = buf.read(1)
        if not first:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        payload = buf.read(size)
        if buf.read(16) != sync:
            raise ValueError("avro block sync mismatch (corrupt container)")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec}")
        pb = io.BytesIO(payload)
        for _ in range(count):
            rows.append(_decode_value(pb, schema))
    return schema, rows


# -- distributed source -----------------------------------------------------

def read_avro_dir(spark, glob: str, spark_schema: str):
    """Distributed Avro scan: `binaryFile` over the container files (one
    task per file, same partitioning story as the shapefile source),
    pure-python block decode inside the task, Arrow-batched emit.
    ``spark_schema`` is the flat DDL of the record fields."""
    import pandas as pd

    field_names = [
        s.strip().split()[0] for s in spark_schema.split(",") if s.strip()
    ]

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                _, recs = read_avro(bytes(content))
                rows.extend(recs)
            yield pd.DataFrame(
                [[r[c] for c in field_names] for r in rows],
                columns=field_names,
            )

    files = spark.read.format("binaryFile").load(glob)
    return files.select("content").mapInPandas(decode, schema=spark_schema)


# -- block-granular splits (the 100 TB path) --------------------------------

def _read_header(f) -> tuple[dict, str, bytes, int]:
    """Read magic + metadata + sync from an open file → (schema, codec,
    sync, first_block_offset)."""
    if f.read(4) != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta = {}
    while True:
        n = read_long(f)
        if n == 0:
            break
        if n < 0:
            read_long(f)
            n = -n
        for _ in range(n):
            k = read_bytes(f).decode()
            meta[k] = read_bytes(f)
    sync = f.read(16)
    return (
        json.loads(meta["avro.schema"]),
        meta.get("avro.codec", b"null").decode(),
        sync,
        f.tell(),
    )


def read_avro_split(
    path: str, start: int, end: int
) -> tuple[dict, list[dict]]:
    """Decode the blocks whose SYNC-ALIGNED start falls in [start, end) —
    the Hadoop AvroInputFormat split rule: a task seeks to the first sync
    marker at-or-after its offset and owns every block from there until a
    block begins at-or-beyond its end. Each block belongs to exactly one
    split, so a partition of [0, filesize) decodes each row exactly
    once."""
    with open(path, "rb") as f:
        schema, codec, sync, first = _read_header(f)
        size = os.fstat(f.fileno()).st_size
        # position at the first block boundary at-or-after `start`
        if start <= first:
            pos = first
        else:
            # scan for the sync marker; the block after it starts the split
            f.seek(max(start - 16, first))
            window = f.read(min(end - start + 16 + 2**20, size))
            idx = window.find(sync)
            if idx < 0:
                return schema, []
            pos = max(start - 16, first) + idx + 16
        rows: list[dict] = []
        f.seek(pos)
        while pos < end and pos < size:
            count = read_long(f)
            blen = read_long(f)
            payload = f.read(blen)
            if f.read(16) != sync:
                raise ValueError("avro block sync mismatch (corrupt container)")
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            elif codec != "null":
                raise NotImplementedError(f"codec {codec}")
            pb = io.BytesIO(payload)
            for _ in range(count):
                rows.append(_decode_value(pb, schema))
            pos = f.tell()
        return schema, rows


def read_avro_dir_split(
    spark, paths: list[str], spark_schema: str, split_bytes: int = 1 << 20
):
    """Distributed scan with BLOCK-GRANULAR parallelism: each file is cut
    into byte-range splits on the driver (listing only — no data read),
    every (path, start, end) range becomes a task, and tasks resolve their
    ranges to whole Avro blocks via the sync-marker rule above. This is
    how one 10 GB container fans out across executors instead of pinning
    a single task — the spec's stated reason blocks carry sync markers.
    Requires the paths to be visible on every executor (local FS here;
    object stores at scale)."""
    import pandas as pd

    field_names = [
        s.strip().split()[0] for s in spark_schema.split(",") if s.strip()
    ]
    splits = []
    for p in sorted(paths):
        size = os.path.getsize(p)
        for off in range(0, max(size, 1), split_bytes):
            splits.append((p, off, min(off + split_bytes, size)))

    def decode(batches):
        for pdf in batches:
            rows = []
            for path, start, end in zip(
                pdf["path"], pdf["start"], pdf["end"]
            ):
                _, recs = read_avro_split(path, int(start), int(end))
                rows.extend(recs)
            yield pd.DataFrame(
                [[r[c] for c in field_names] for r in rows],
                columns=field_names,
            )

    from ..tables import literal_frame

    sdf = literal_frame(
        spark, splits, "path string, start long, end long"
    ).repartition(max(len(splits), 1))
    return sdf.mapInPandas(decode, schema=spark_schema)
