"""Unit tests for the corpus text operators (textops.py) on hand-built
documents where the expected statistics are known by inspection."""

from __future__ import annotations

from pyspark.sql import functions as F

from repcheck_data_integration_spark.operators.textops import (
    EMAIL_RE,
    PHONE_RE,
    term_counts,
)


def test_term_counts_collapses_occurrences(spark):
    d = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y"), (3, "")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["tok"]): r["cnt"] for r in term_counts(d).collect()
    }
    assert got == {(1, "a"): 3, (1, "b"): 1, (2, "x"): 1, (2, "y"): 1}
    # doc 3 (no tokens) emits nothing — matches the SQL unnest semantics


def test_pii_regexes_mask_and_count(spark):
    df = spark.createDataFrame(
        [("reach me at bob.smith+x@mail-host.co or 415-555-0199 now",)],
        ["s"],
    )
    out = df.select(
        F.regexp_count("s", F.lit(EMAIL_RE)).alias("e"),
        F.regexp_count("s", F.lit(PHONE_RE)).alias("p"),
        F.regexp_replace(
            F.regexp_replace("s", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("red"),
    ).collect()[0]
    assert (out["e"], out["p"]) == (1, 1)
    assert out["red"] == "reach me at <EMAIL> or <PHONE> now"


def test_repetition_stats_known_doc(spark, monkeypatch):
    from repcheck_data_integration_spark.operators import textops

    d = spark.createDataFrame(
        [(7, "w w w w z q")], ["doc_id", "text"]
    )  # 6 tokens, 3 distinct, top 'w'x4
    monkeypatch.setattr(
        "repcheck_data_integration_spark.operators.textops.load",
        lambda spark, sf, name: d,
    )
    row = textops.text_repetition_stats(spark, "unused").collect()[0]
    assert row["n_tokens"] == 6 and row["n_distinct"] == 3
    assert row["top_token"] == "w" and row["top_count"] == 4
    assert row["distinct_ratio"] == 0.5
    assert abs(row["top_share"] - 0.6667) < 1e-9


def test_repetition_top_token_tiebreak(spark, monkeypatch):
    from repcheck_data_integration_spark.operators import textops

    d = spark.createDataFrame([(1, "b a b a")], ["doc_id", "text"])
    monkeypatch.setattr(
        "repcheck_data_integration_spark.operators.textops.load",
        lambda spark, sf, name: d,
    )
    row = textops.text_repetition_stats(spark, "unused").collect()[0]
    assert row["top_token"] == "a"  # equal counts → lexicographically first


def test_bpe_train_matches_python_reference(spark):
    """The distributed trainer's first 3 merge rules must equal a pure
    python BPE reference (same tie-break: count desc, pair asc; same
    greedy left-to-right merge application)."""
    import re
    from collections import Counter

    from repcheck_data_integration_spark import registry

    registry.load_all_modules()
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text")
        .collect()
    )
    freq = Counter()
    for r in docs:
        for w in re.findall("[a-z0-9]+", r["text"]):
            if len(w) > 1:
                freq[w] += 1
    syms = {w: list(w) for w in freq}
    expect = []
    for _ in range(3):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += freq[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        expect.append((a, b, n))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    got = [
        (r["sym_a"], r["sym_b"], r["n_occurrences"])
        for r in sorted(
            registry.QUERIES["text_bpe_train"](
                spark, "/root/testdata/sf0.001"
            ).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]
    assert got == expect, (got, expect)


def test_bpe_encode_matches_python_reference(spark):
    """text_bpe_encode's per-document subtoken counts must equal a pure
    python train(3)+encode reference over every sf0.001 document —
    including docs whose words never hit a merge rule and empty docs."""
    import re
    from collections import Counter

    from repcheck_data_integration_spark import registry

    registry.load_all_modules()
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    freq = Counter()
    for r in rows:
        for w in re.findall("[a-z0-9]+", r["text"]):
            if len(w) > 1:
                freq[w] += 1
    syms = {w: list(w) for w in freq}
    rules = []
    for _ in range(3):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += freq[w]
        if not pc:
            break
        (a, b), _ = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((a, b))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out

    def encode_len(word: str) -> int:
        s = list(word)
        for a, b in rules:
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            s = out
        return len(s)

    expect = {
        r["doc_id"]: sum(
            encode_len(w) for w in re.findall("[a-z0-9]+", r["text"])
        )
        for r in rows
    }
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in registry.QUERIES["text_bpe_encode"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == expect


def test_udtf_sentences_is_real_udtf_and_matches_native(spark):
    """fn_udtf_sentences must execute a python UDTF node (BatchEvalPythonUDTF
    in the plan — not a rewritten native expression) and agree row-for-row
    with the native posexplode twin."""
    from repcheck_data_integration_spark import registry

    registry.load_all_modules()
    sf = "/root/testdata/sf0.001"
    u = registry.QUERIES["fn_udtf_sentences"](spark, sf)
    plan = u._jdf.queryExecution().executedPlan().toString()
    assert "UDTF" in plan, plan[:500]
    native = registry.QUERIES["text_sentence_split"](spark, sf)
    cols = ["doc_id", "sent_idx", "sentence_md5", "n_sent_chars"]
    assert sorted(map(tuple, u.select(cols).collect())) == sorted(
        map(tuple, native.select(cols).collect())
    )


def test_heavy_hitters_exact_on_synthetic_skew(spark, monkeypatch):
    """MG candidates+verify must return exactly the words above n/cap on a
    skewed corpus spread over many partitions (forces per-partition MG
    summaries to merge), matching a brute-force count."""
    from collections import Counter

    from repcheck_data_integration_spark.operators import textops

    docs = []
    words = []
    for i in range(400):
        w = "hot" if i % 3 == 0 else f"w{i % 150}"
        docs.append((i, f"{w} filler{i % 97}"))
        words += [w, f"filler{i % 97}"]
    d = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(8)
    monkeypatch.setattr(
        "repcheck_data_integration_spark.operators.textops.load",
        lambda spark, sf, name: d,
    )
    got = {
        (r["word"], r["n_occurrences"])
        for r in textops.agg_heavy_hitters_exact(spark, "unused").collect()
    }
    cnt = Counter(words)
    n = sum(cnt.values())
    expect = {
        (w, c) for w, c in cnt.items() if c * textops.MG_CAPACITY > n
    }
    assert got == expect and len(expect) > 0


def test_compression_ratio_separates_repetition(spark, monkeypatch):
    """zlib-ratio signal: repetitive text deflates hard, high-entropy text
    doesn't; ratios must be reproducible exactly for fixed input (CPython's
    bundled zlib is deterministic at a given level)."""
    import random

    from repcheck_data_integration_spark.operators import textstats

    rng = random.Random(7)
    noisy = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ")
                    for _ in range(2000))
    d = spark.createDataFrame(
        [(1, "spam ham " * 250), (2, noisy), (3, "")],
        ["doc_id", "text"],
    )
    monkeypatch.setattr(
        "repcheck_data_integration_spark.operators.textstats.load",
        lambda spark, sf, name: d,
    )
    rows = {
        r["doc_id"]: r
        for r in textstats.text_compression_ratio(spark, "unused").collect()
    }
    assert rows[1]["compression_ratio"] < 0.05
    assert rows[2]["compression_ratio"] > 0.6
    assert rows[3]["n_bytes"] == 0 and rows[3]["compression_ratio"] == 0.0
    # determinism: re-running yields identical deflate byte counts
    again = {
        r["doc_id"]: r["n_deflate"]
        for r in textstats.text_compression_ratio(spark, "unused").collect()
    }
    assert again == {k: v["n_deflate"] for k, v in rows.items()}


def test_pmi_pairs_planted_collocation(spark, tmp_path):
    """Two tokens that ALWAYS co-occur in a quarter of the corpus get
    PMI = ln(4); a pair co-occurring at independence rate gets ~0; rare
    tokens below the df floor never appear."""
    import math
    import os
    from repcheck_data_integration_spark.operators.textops import (
        PMI_MIN_CO,
        PMI_MIN_DF,
        text_pmi_pairs,
    )

    n = 80
    docs = []
    for i in range(n):
        toks = ["common"]  # df = n, pairs with everything at chance
        if i < n // 4:
            toks += ["alpha", "beta"]  # perfect collocation in n/4 docs
        if i % 2 == 0:
            toks += ["even"]
        docs.append((i, " ".join(toks), "en", "s", 10))
    assert n // 4 >= max(PMI_MIN_DF, PMI_MIN_CO)
    spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = {(r["tok_a"], r["tok_b"]): r for r in
           text_pmi_pairs(spark, str(tmp_path)).collect()}
    ab = out[("alpha", "beta")]
    assert ab["n_co"] == n // 4 and ab["df_a"] == n // 4
    want = math.floor(
        math.floor(math.log(n / (n // 4)) * 1e6 + 0.5) / 1e6 * 1e4 + 0.5
    ) / 1e4
    assert ab["pmi"] == want
    assert ab["rk"] == 1  # strongest association ranks first
    # 'common' pairs sit at PMI ~ 0 (independence)
    ce = out[("common", "even")]
    assert abs(ce["pmi"]) < 0.001


def test_token_count_bpe_matches_iterative_lowest_rank(spark):
    """text_token_count_bpe's rank-ordered single-pass replace chain must
    equal the iterative lowest-rank-first algorithm tiktoken/GPT-2 apply
    (the equivalence holds for training-consistent merge tables — argued in
    the op's module comment, PINNED here per symbol-count on the real
    sf0.001 vocabulary plus adversarial overlap words)."""
    from repcheck_data_integration_spark.operators.textops import (
        BPE_DEMO_MERGES,
        BPE_DEMO_RS,
        BPE_DEMO_US,
        text_token_count_bpe,
    )

    ranks = {m: i for i, m in enumerate(BPE_DEMO_MERGES)}

    def ref_n_tokens(word: str) -> int:
        syms = list(word)
        while len(syms) > 1:
            best = min(
                (ranks.get((syms[i], syms[i + 1]), 10**9), i)
                for i in range(len(syms) - 1)
            )
            if best[0] == 10**9:
                break
            a, b = BPE_DEMO_MERGES[best[0]]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    # adversarial overlaps: repeated-pair runs, rule-feeding chains,
    # merged-symbol boundaries that a delimiter-less replace would corrupt
    words = [
        "the", "theater", "thethe", "aaaa", "aaaaa", "ingesting",
        "representation", "others", "section8", "government", "x", "90210",
        "ththth", "erer", "anand", "ionion",
    ]
    import re

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text")
        .limit(50)
        .collect()
    )
    vocab = sorted({w for r in docs for w in re.findall("[a-z0-9]+", r["text"])})
    words += vocab[:400]

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(w,) for w in words], ["word"])
    s = F.regexp_replace(F.col("word"), "(.)", f"{BPE_DEMO_US}$1{BPE_DEMO_RS}")
    for a, b in BPE_DEMO_MERGES:
        s = F.replace(
            s,
            F.lit(f"{BPE_DEMO_US}{a}{BPE_DEMO_RS}{BPE_DEMO_US}{b}{BPE_DEMO_RS}"),
            F.lit(f"{BPE_DEMO_US}{a}{b}{BPE_DEMO_RS}"),
        )
    got = {
        r["word"]: r["n"]
        for r in df.select(
            "word",
            (F.length(s) - F.length(F.replace(s, F.lit(BPE_DEMO_US)))).alias("n"),
        ).collect()
    }
    for w in words:
        assert got[w] == ref_n_tokens(w), (w, got[w], ref_n_tokens(w))


def test_token_count_bpe_fertility_and_totals(spark):
    """Per-doc totals are consistent: n_bpe_tokens <= sum of word lengths,
    >= n_words (a merge can only shrink, never below 1 symbol per word),
    and fertility == round4(n_bpe/n_words)."""
    from repcheck_data_integration_spark.operators.textops import (
        text_token_count_bpe,
    )

    rows = text_token_count_bpe(spark, "/root/testdata/sf0.001").collect()
    assert rows
    import math

    for r in rows[:200]:
        if r["n_words"] == 0:
            assert r["n_bpe_tokens"] == 0 and r["fertility"] is None
            continue
        assert r["n_bpe_tokens"] >= r["n_words"]
        want = math.floor(r["n_bpe_tokens"] / r["n_words"] * 10000.0 + 0.5) / 10000.0
        assert r["fertility"] == want
