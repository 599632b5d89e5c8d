"""DSIR importance resampling (llm_ops/dsir.py): hashed-n-gram
density-ratio weights, deterministic hash-Gumbel noise, and the
bounded-key-group top-fraction selection — bit-exact across Spark /
DuckDB / pure Python."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from gcp_dataengineering_spark.llm_ops.dsir import (
    dsir_fit,
    dsir_fit_py,
    dsir_resample,
    dsir_resample_py,
    dsir_score,
    dsir_score_py,
    hash_gumbel,
    hash_gumbel_py,
    hash_gumbel_sql,
)

# two distinguishable vocabularies: "target-like" text vs crawl noise
_TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "a fox and a dog walk into the quiet library",
    "the brown dog reads the quick library book",
    "quiet library books over lazy brown dogs",
]
_RAW_NOISE = [
    "click here buy cheap pills now win prizes",
    "lottery winner claim prize click buy now",
    "cheap pills win lottery click claim now",
    "buy cheap win now click here prize pills",
]


def test_hash_gumbel_three_way_parity(spark):
    """hash_gumbel (Spark) == hash_gumbel_sql (DuckDB) ==
    hash_gumbel_py over string and bigint ids, including negative
    ids; all values are finite fixed-point integers."""
    rng = random.Random(20260816)
    ids = [0, 1, -1, 7, 1 << 40] + [rng.randrange(-(2**40), 2**40) for _ in range(60)]
    df = spark.createDataFrame([(i,) for i in ids], "i long")
    got = {
        r.i: r.g
        for r in df.select("i", hash_gumbel(F.col("i")).alias("g")).collect()
    }
    con = duckdb.connect()
    expr = hash_gumbel_sql("i")
    for i in ids:
        want = hash_gumbel_py(i)
        assert got[i] == want, (i, got[i], want)
        sql = con.execute(
            f"SELECT {expr} FROM (SELECT ?::BIGINT AS i)", [i]
        ).fetchone()[0]
        assert sql == want, (i, sql, want)


def test_dsir_fit_and_score_match_python_twin(spark):
    """dsir_fit weights and dsir_score per-doc log-weights equal the
    pure-Python twin exactly (ngrams=2, the paper's feature set)."""
    target = spark.createDataFrame([(t,) for t in _TARGET], "text string")
    raw = spark.createDataFrame(
        [(t,) for t in _TARGET + _RAW_NOISE], "text string"
    )
    model = dsir_fit(target, raw, num_buckets=64)
    rows = {r.bucket: r for r in model.collect()}
    twin = dsir_fit_py(_TARGET, _TARGET + _RAW_NOISE, num_buckets=64)
    assert len(rows) == 64
    for b in range(64):
        assert rows[b].weight == twin["weights"][b], b
        assert rows[b].c_target == twin["c_target"][b]
        assert rows[b].c_raw == twin["c_raw"][b]

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TARGET + _RAW_NOISE)],
        "doc_id long, text string",
    )
    scored = dsir_score(docs, model)
    got = {r.doc_id: r.dsir_logw for r in scored.collect()}
    for i, t in enumerate(_TARGET + _RAW_NOISE):
        assert got[i] == dsir_score_py(t, twin["weights"]), (i, t)
    # feature-less text scores exactly 0 (density ratio 1)
    empty = dsir_score(
        spark.createDataFrame([(99, "123 !!!")], "doc_id long, text string"),
        model,
    )
    assert empty.collect()[0].dsir_logw == 0


def test_dsir_separates_target_from_noise(spark):
    """The semantic claim: every target-vocabulary document outscores
    every noise document, and top-k (gumbel=False) selection at 1/2
    picks exactly the target-like half."""
    target = spark.createDataFrame([(t,) for t in _TARGET], "text string")
    corpus = _TARGET + _RAW_NOISE
    raw = spark.createDataFrame([(t,) for t in corpus], "text string")
    model = dsir_fit(target, raw, num_buckets=128)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    scored = dsir_score(docs, model)
    vals = {r.doc_id: r.dsir_logw for r in scored.collect()}
    worst_target = min(vals[i] for i in range(len(_TARGET)))
    best_noise = max(vals[i + len(_TARGET)] for i in range(len(_RAW_NOISE)))
    assert worst_target > best_noise
    picked = dsir_resample(scored, 1, 2, gumbel=False)
    sel = {r.doc_id for r in picked.collect() if r.selected}
    assert sel == set(range(len(_TARGET)))


def test_dsir_resample_matches_python_twin(spark):
    """dsir_resample (gumbel on and off) equals dsir_resample_py
    row-for-row on synthetic scores with planted key-group ties, and
    the selected count hits the target up to tie granularity."""
    rng = random.Random(7)
    rows = [(i, rng.randrange(-(1 << 24), 1 << 24)) for i in range(400)]
    # plant exact ties in the quantized key space
    rows += [(400 + j, 5 << 12) for j in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, dsir_logw long")
    for gumbel in (True, False):
        got = {
            r.doc_id: (r.dsir_key, r.selected)
            for r in dsir_resample(df, 1, 4, gumbel=gumbel).collect()
        }
        want = dsir_resample_py(rows, 1, 4, gumbel=gumbel)
        assert got == want
        n_sel = sum(1 for _, s in got.values() if s)
        # tie granularity: selected >= target only over-runs by the
        # boundary group, and never under-runs below the previous group
        assert n_sel >= len(rows) // 4 - 16
        assert n_sel <= len(rows) // 4 + 16


def test_dsir_resample_rejects_bad_fraction(spark):
    df = spark.createDataFrame([(1, 0)], "doc_id long, dsir_logw long")
    with pytest.raises(ValueError):
        dsir_resample(df, 0, 4)
    with pytest.raises(ValueError):
        dsir_resample(df, 1, 0)


def test_dsir_gumbel_sampling_tracks_weights(spark):
    """Distributional sanity for the hash-Gumbel estimator: with two
    weight classes 2^4 apart in log2 units, the high-weight class is
    selected at a visibly higher rate at keep=1/4 — the ∝-weight
    sampling property the Gumbel-top-k construction promises."""
    hi = [(i, 4 << 16) for i in range(500)]  # log2 w = +4
    lo = [(i + 500, -(4 << 16)) for i in range(500)]  # log2 w = -4
    df = spark.createDataFrame(hi + lo, "doc_id long, dsir_logw long")
    sel = {
        r.doc_id
        for r in dsir_resample(df, 1, 4).collect()
        if r.selected
    }
    hi_rate = sum(1 for i in range(500) if i in sel) / 500
    lo_rate = sum(1 for i in range(500, 1000) if i in sel) / 500
    assert hi_rate > 3 * lo_rate
    assert hi_rate > 0.4  # most of the selection budget goes high


def test_pipeline_dsir_stage(spark):
    """r17 wave 4 — DSIR inside the composed build: with dsir_target
    set, the survivors of the heuristic gates are scored/keyed/
    selected exactly as a direct dsir_fit→score→resample composition
    over the same frame; the selection feeds the downstream stages
    (exact_deduped ⊆ selected); model + scored frames ship as
    stages["dsir_model"]/"dsir"; gumbel=False keeps the target-like
    half; a bad keep fraction raises."""
    from gcp_dataengineering_spark.llm_ops.dsir import (
        dsir_fit as _fit,
        dsir_resample as _resample,
        dsir_score as _score,
    )
    from gcp_dataengineering_spark.llm_ops.pipeline import (
        PipelineConfig,
        build_training_corpus,
    )

    targetish = (
        "the quick brown fox jumps over the lazy dog while the quiet "
        "library keeps its long rows of heavy books in order"
    )
    noisy = (
        "click here to buy cheap pills and win the big lottery prize "
        "now with this amazing offer you cannot refuse today friend"
    )

    def page(i):
        base = targetish if i % 2 == 0 else noisy
        return (i, f"{base} page number marker {i} closes the page", f"s{i % 2}", "en")

    docs = spark.createDataFrame(
        [page(i) for i in range(12)],
        "doc_id long, text string, source string, lang string",
    )
    target = spark.createDataFrame(
        [(f"{targetish} sample {j}",) for j in range(4)], "text string"
    )
    cfg = PipelineConfig(
        dsir_target=target, dsir_keep=(1, 2), dsir_buckets=128,
        dsir_gumbel=False,
        shard_budget_tokens=2000, minhash_hashes=16, lsh_bands=4,
    )
    stages = build_training_corpus(docs, config=cfg)
    assert "dsir" in stages and "dsir_model" in stages
    got = {
        r["doc_id"]: (r["dsir_logw"], r["dsir_key"], r["selected"])
        for r in stages["dsir"].collect()
    }

    # direct twin over the pipeline's own gated population: the
    # scored pool is the post-heuristic-gate corpus (all 12 pages
    # pass the default gate by construction)
    model = _fit(target, docs.select("text"), num_buckets=128)
    direct = _resample(
        _score(docs.select("doc_id", "text"), model), 1, 2, gumbel=False
    )
    want = {
        r["doc_id"]: (r["dsir_logw"], r["dsir_key"], r["selected"])
        for r in direct.collect()
    }
    assert got == want
    sel = {d for d, (_, _, s) in got.items() if s}
    assert sel == {i for i in range(12) if i % 2 == 0}  # the target-like half

    kept = {r["doc_id"] for r in stages["exact_deduped"].select("doc_id").collect()}
    assert kept <= sel and kept  # downstream only sees the selection

    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep fraction"):
        build_training_corpus(
            docs,
            config=PipelineConfig(
                dsir_target=target, dsir_keep=(0, 2),
                shard_budget_tokens=2000, minhash_hashes=16, lsh_bands=4,
            ),
        )


def test_dsir_save_load_round_trip(spark, tmp_path):
    """dsir_save/dsir_load: the persisted model scores a corpus
    bit-identically to the in-memory one, and the meta carries the
    feature settings the scorer must mirror."""
    from gcp_dataengineering_spark.llm_ops.dsir import (
        dsir_fit,
        dsir_load,
        dsir_save,
        dsir_score,
    )

    target = spark.createDataFrame([(t,) for t in _TARGET], "text string")
    raw = spark.createDataFrame(
        [(t,) for t in _TARGET + _RAW_NOISE], "text string"
    )
    model = dsir_fit(target, raw, num_buckets=64, ngrams=1)
    path = str(tmp_path / "dsir_model")
    dsir_save(model, path, ngrams=1)
    loaded, meta = dsir_load(spark, path)
    assert meta == {"salt": "dsir", "ngrams": 1, "word_pattern": "[^a-z]+"}

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TARGET + _RAW_NOISE)],
        "doc_id long, text string",
    )
    want = {
        r.doc_id: r.dsir_logw
        for r in dsir_score(docs, model, ngrams=1).collect()
    }
    got = {
        r.doc_id: r.dsir_logw
        for r in dsir_score(
            docs, loaded, ngrams=meta["ngrams"], salt=meta["salt"],
            word_pattern=meta["word_pattern"],
        ).collect()
    }
    assert got == want


def test_dsir_resample_per_partition_budget(spark):
    """part_cols=("lang",): the keep fraction is enforced WITHIN each
    language (the CCNet-style budget — a high-resource language
    cannot absorb the whole selection), each partition's verdicts
    equal an independent per-partition twin run, and the global path
    (no part_cols) is byte-unchanged."""
    rng = random.Random(11)
    rows = [(i, rng.randrange(-(1 << 24), 1 << 24), "en" if i < 300 else "fr")
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, dsir_logw long, lang string")
    out = {
        r.doc_id: (r.dsir_key, r.selected, r.lang)
        for r in dsir_resample(df, 1, 4, part_cols=("lang",)).collect()
    }
    for lang, ids in (("en", range(300)), ("fr", range(300, 400))):
        sub = [(i, s) for i, s, l in rows if l == lang]
        want = dsir_resample_py(sub, 1, 4)
        got = {i: (k, s) for i, (k, s, l) in out.items() if l == lang}
        assert got == want, lang
        n_sel = sum(1 for _, s in got.values() if s)
        assert abs(n_sel - len(sub) // 4) <= 8  # per-partition budget holds
