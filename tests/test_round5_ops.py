"""Round-5 operator unit tests: Bradley-Terry ranking, char edit rate,
RAG retrieval eval — known-answer cases on constructed fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from repcheck_data_integration_spark import registry

registry.load_all_modules()


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )


def test_bradley_terry_orders_by_quality(spark, tmp_path):
    """Blocks of BT_BLOCK docs; source 'good' docs always have a higher
    distinct-token ratio than 'bad' docs, so good beats bad in every
    block and must out-rank it with more wins."""
    from repcheck_data_integration_spark.operators.llm import BT_BLOCK

    rows = []
    for b in range(6):
        for k in range(BT_BLOCK):
            doc_id = b * BT_BLOCK + k
            if k % 2 == 0:
                # high distinct ratio: all-unique words
                text = " ".join(f"u{doc_id}w{j}" for j in range(12))
                src = "good"
            else:
                # low distinct ratio: one word repeated
                text = " ".join(["rep"] * 12)
                src = "bad"
            rows.append((doc_id, text, "en", src, len(text)))
    _write_docs(spark, tmp_path, rows)
    out = registry.QUERIES["ml_bradley_terry"](spark, str(tmp_path)).collect()
    r = {row["source"]: row for row in out}
    assert set(r) == {"good", "bad"}
    assert r["good"]["rank"] == 1
    assert r["good"]["strength"] > r["bad"]["strength"]
    assert r["good"]["wins"] > r["bad"]["wins"]


def test_edit_rate_known_values(spark, tmp_path):
    """Identical cand/ref window -> distance 0; a known substitution
    count reproduces levenshtein exactly."""
    # text tokens join to a char stream; CHRF_CAND_CHARS=48,
    # CHRF_REF_START=13: cand = cs[0:48], ref = cs[12:12+64]
    base = "abcdefghijkl" * 10  # 120 chars, period 12 -> cand == ref prefix
    rows = [(1, " ".join([base[i:i+6] for i in range(0, len(base), 6)]),
             "en", "src0", len(base))]
    _write_docs(spark, tmp_path, rows)
    out = registry.QUERIES["llm_eval_edit_rate"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    # period-12 stream: shifting by 12 chars reproduces the same text,
    # so the 48-char cand equals the first 48 chars of the ref window
    # and the extra ref tail costs pure insertions
    assert r["edit_distance"] == r["r_len"] - r["c_len"]


def test_rag_eval_ndcg_bounds(spark):
    """On the real fixture: rr and ndcg in [0, 1]; ndcg = 1 whenever all
    retrieved docs are relevant; rr = 1 whenever rank 1 is relevant."""
    out = registry.QUERIES["llm_rag_eval"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    for r in out:
        assert 0.0 <= r["rr"] <= 1.0
        assert 0.0 <= r["ndcg"] <= 1.0
        if r["n_rel"] == 3:
            assert r["ndcg"] == 1.0
        if r["first_rel_rank"] == 1:
            assert r["rr"] == 1.0


def test_embedding_pairs_symmetric_free_and_thresholded(spark):
    out = registry.QUERIES["dedup_embedding_pairs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    pairs = {(r["vec1"], r["vec2"]) for r in out}
    assert len(pairs) == len(out)  # no duplicate candidate survives
    assert all(a < b for a, b in pairs)
    assert all(r["cosine_sim"] >= 0.25 for r in out)
