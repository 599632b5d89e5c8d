"""Generalized-order Kneser-Ney (llm_ops/ngram_kn.py, r17): the
CCNet-published 5-gram configuration, cross-validated at the orders
where an INDEPENDENT implementation exists and three-engine-exact at
the new orders."""
import duckdb
import pandas as pd
import pytest

from gcp_dataengineering_spark.llm_ops import ngram_kn as NK
from gcp_dataengineering_spark.llm_ops import ngram_lm as NL

TEXTS = {
    1: "the cat sat on the mat",
    2: "the cat sat on the cat and the dog sat too",
    3: "san francisco is in california and san francisco is foggy",
    4: "",
    5: "the the the the the",
    6: "cat",
    7: "a nice day and a nice cat and a nice dog",
    8: "the dog sat on the mat the dog sat on the mat",
    9: "nice francisco nice day the cat sat on the dog",
    10: "zq1 vx2 zq1 vx2 zq1",
    11: "on the mat the cat sat quietly and the dog sat on the mat too",
}


def _rows(df):
    return {
        r["doc_id"]: (r["n_trans"], r["nll_fp"], r["ppl_bits"])
        for r in df.collect()
    }


def test_kn_generic_cross_validates_and_extends_to_order5(spark):
    """(a) At orders 2 and 3 the generic implementation EXACTLY
    matches ngram_lm's independently-written smoothing="kn" forms
    (Spark vs Spark and twin vs twin — two code paths, one answer);
    (b) at orders 4 and 5 (no sibling exists) Spark == twin ==
    DuckDB exactly, self-scored and ref-split; (c) the order guard
    rejects 1 and 6."""
    df = spark.createDataFrame(list(TEXTS.items()), "doc_id long, text string")
    ref = df.filter("doc_id <= 8")
    rt = {k: v for k, v in TEXTS.items() if k <= 8}
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": list(TEXTS), "text": list(TEXTS.values())}),
    )

    for o, fn, fnpy in (
        (2, NL.bigram_perplexity, NL.bigram_perplexity_py),
        (3, NL.trigram_perplexity, NL.trigram_perplexity_py),
    ):
        assert _rows(NK.kn_perplexity(df, ref=ref, order=o)) == _rows(
            fn(df, ref=ref, smoothing="kn")
        ), o
        assert NK.kn_perplexity_py(TEXTS, order=o, ref_texts=rt) == fnpy(
            TEXTS, smoothing="kn", ref_texts=rt
        ), o

    for o in (4, 5):
        for ref_, rt_, rf in ((None, None, None), (ref, rt, "doc_id <= 8")):
            got = _rows(NK.kn_perplexity(df, ref=ref_, order=o))
            exp = NK.kn_perplexity_py(TEXTS, order=o, ref_texts=rt_)
            assert got == exp, (o, rf)
            duck = {
                r[0]: (r[1], r[2], r[3])
                for r in con.execute(
                    NK.kn_perplexity_sql(order=o, ref_filter=rf)
                ).fetchall()
            }
            assert duck == exp, (o, rf)

    with pytest.raises(ValueError, match="order"):
        NK.kn_perplexity(df, order=1)
    with pytest.raises(ValueError, match="order"):
        NK.kn_perplexity_py(TEXTS, order=6)
    with pytest.raises(ValueError, match="order"):
        NK.kn_perplexity_sql(order=6)


def test_kn_order5_ordering_and_rare_context(spark):
    """The order-5 KN keeps the published behaviors: reference-
    trained ordering (memorized < novel-fluent < gibberish) and the
    continuation-count rare-context separation the bigram fixture
    pins ("nice day" vs "nice francisco")."""
    fluent = "the quick brown fox jumps over the lazy dog"
    ref_rows = [(1000 + i, fluent) for i in range(12)] + [
        (2000, "san francisco"), (2001, "san francisco"),
        (2002, "san francisco"), (2003, "one day"),
        (2004, "another day"), (2005, "every day"),
        (2006, "nice weather nice weather"),
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    probes = {
        1: fluent,                                   # memorized
        2: "the quick brown dog jumps over the lazy fox",  # novel-fluent
        3: "zq1 vx9 qq3 zz7 pp2 xx4",                # gibberish
        101: "nice day",
        102: "nice francisco",
    }
    docs = spark.createDataFrame(list(probes.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r["ppl_bits"]
        for r in NK.kn_perplexity(docs, ref=ref, order=5, min_count=1).collect()
    }
    assert got[1] < got[2] < got[3]
    assert got[101] < got[102]
    # twin agrees on every probe
    rt = {k: v for k, v in dict(ref_rows).items()}
    exp = NK.kn_perplexity_py(probes, order=5, min_count=1, ref_texts=rt)
    assert {k: v[2] for k, v in exp.items()} == got


def test_kn_generic_fit_score_and_persistence(spark, tmp_path):
    """r17 wave 2: the generalized-order fit/score split — an
    order-5 (and order-4) kn_lm_fit model scores EXACTLY like the
    one-shot ref-trained kn_perplexity; the flat model survives an
    lm_save/lm_load parquet round trip; and ngram_lm.lm_score
    dispatches kn_generic models (the streaming gate's load path)."""
    from gcp_dataengineering_spark.llm_ops.ngram_kn import (
        kn_lm_fit,
        kn_lm_score,
        kn_perplexity,
    )
    from gcp_dataengineering_spark.llm_ops.ngram_lm import (
        lm_load,
        lm_save,
        lm_score,
    )

    df = spark.createDataFrame(list(TEXTS.items()), "doc_id long, text string")
    ref = df.filter("doc_id <= 8")

    for o in (4, 5):
        m = kn_lm_fit(ref, order=o)
        assert _rows(kn_lm_score(df, m)) == _rows(
            kn_perplexity(df, ref=ref, order=o)
        ), o

    m5 = kn_lm_fit(ref, order=5)
    path = str(tmp_path / "kn5")
    lm_save(m5, path)
    reloaded = lm_load(spark, path)
    assert reloaded["impl"] == "kn_generic" and reloaded["order"] == 5
    exp = _rows(kn_perplexity(df, ref=ref, order=5))
    assert _rows(kn_lm_score(df, reloaded)) == exp
    # the dispatching entry point the streaming gate uses
    assert _rows(lm_score(df, reloaded)) == exp
