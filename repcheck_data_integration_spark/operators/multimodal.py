"""Multimodal column plumbing (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns + typed metadata
structs; decode/feature-extract/resize/frame-sample run as Arrow-batched
pandas functions over ``mapInPandas``. The media libraries (PIL/ffmpeg/…)
are not in this container, so the decode *kernel* is stubbed — gated behind
an import-try raising NotImplementedError — while everything Spark-side
(schema, batch iteration, partitioning, UDF signatures) is real and tested.
The fixture "media" is the documents table's text re-encoded as bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

CHUNK = 64  # bytes per fake "frame"


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           source AS media_source
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata: byte length and content hash computed
    on the binary column natively (both engines hash the UTF-8 bytes)."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.col("source").alias("media_source"),
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           md5(substr(text, i * {CHUNK} + 1, {CHUNK})) AS frame_md5,
           CAST(length(substr(text, i * {CHUNK} + 1, {CHUNK})) AS BIGINT)
               AS frame_bytes
    FROM documents,
         unnest(generate_series(0, CAST(floor((length(text) - 1) / {CHUNK})
                                        AS BIGINT))) AS u(i)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: split each payload into fixed-size chunks ("frames"),
    one output row per frame with its hash — executed as an Arrow-batched
    mapInPandas kernel (the real shape for video frame extraction: batch in,
    variable rows out). Fixture payloads are ASCII so byte and char offsets
    agree with the SQL oracle."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_md5": [],
                "frame_bytes": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                for i in range(0, max(len(data) - 1, 0) // CHUNK + 1):
                    chunk = data[i * CHUNK : (i + 1) * CHUNK]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        sample,
        schema="doc_id long, frame_idx long, frame_md5 string, frame_bytes long",
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image decode — requires a media library not baked into this
    container; the Spark-side plumbing calls fake_decode_meta instead."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; container ships without media libs"
        ) from e
    raise NotImplementedError("wire PIL Image.open(BytesIO(payload)) here")


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in decode: derive (width, height) from the
    payload hash so the distributed plumbing is exercised end-to-end."""
    import hashlib

    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


@register(
    "mm_decode_stub",
    oracle="""
    SELECT doc_id,
           16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 240
               AS width,
           16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 240
               AS height,
           (16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 240)
           * (16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 240)
               AS n_pixels
    FROM documents
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over mapInPandas with the deterministic fake
    kernel (swap-in point for a real decoder documented in decode_image).
    Because the fake derives dimensions from the payload md5, even this
    Python kernel is oracle-checkable — the SQL twin recomputes the same
    digest bytes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(t.encode("utf-8")) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_pixels": [m[0] * m[1] for m in metas],
                }
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        decode, schema="doc_id long, width int, height int, n_pixels int"
    )


RESIZE_TARGET = 64


def fake_resize(w: int, h: int, target: int = RESIZE_TARGET) -> tuple[int, int]:
    """Aspect-preserving fit-to-width resize in pure integer math (so both
    engines agree bit-for-bit): out_w = target, out_h = max(1, h*target//w).
    Swap-in point for a real PIL Image.resize."""
    return target, max(1, h * target // w)


@register(
    "mm_resize_stub",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id,
               16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 240
                   AS width,
               16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 240
                   AS height
        FROM documents)
    SELECT doc_id, width, height,
           {RESIZE_TARGET} AS out_width,
           CAST(greatest(1, height * {RESIZE_TARGET} // width) AS INTEGER)
               AS out_height
    FROM dims
    """,
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over mapInPandas: decode (fake kernel) → integer
    aspect-preserving resize → new dims. Same batch shape a real
    PIL/ffmpeg kernel would use; fully oracle-checkable because both the
    fake decode and the resize are deterministic integer math."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(t.encode("utf-8")) for t in pdf["text"]]
            outs = [fake_resize(w, h) for w, h in metas]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "out_width": [o[0] for o in outs],
                    "out_height": [o[1] for o in outs],
                }
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        resize,
        schema="doc_id long, width int, height int, out_width int,"
        " out_height int",
    )
