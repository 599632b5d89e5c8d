"""Scale utilities: salted agg/join equivalence, bucketed writes,
and hypothesis property tests for the conform helpers."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gcp_dataengineering_spark.ops.conform import parse_money, week_to_month
from gcp_dataengineering_spark.ops.skew import salted_broadcast_join, salted_sum
from gcp_dataengineering_spark.sources.io import write_bucketed


def test_salted_sum_equals_plain(spark):
    df = spark.range(5000).select(
        (F.col("id") % 7).alias("k"),
        # heavy skew: ~80% of rows land on k=0
        F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id") % 7).alias("hot"),
        (F.col("id") * 1.5).alias("v"),
    )
    plain = {
        r["hot"]: round(r["s"], 6)
        for r in df.groupBy("hot").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r["hot"]: round(r["s"], 6)
        for r in salted_sum(df, ["hot"], {"v": "s"}).collect()
    }
    assert plain == salted


def test_salted_broadcast_join_equals_plain(spark):
    big = spark.range(2000).select(
        F.when(F.col("id") % 3 < 2, 0).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], "k long, name string"
    )
    plain = sorted(map(tuple, big.join(small, "k").select("k", "v", "name").collect()))
    salted = sorted(
        map(tuple, salted_broadcast_join(big, small, "k").select("k", "v", "name").collect())
    )
    assert plain == salted


def test_salted_shuffle_join_equals_plain(spark):
    from gcp_dataengineering_spark.ops.skew import salted_shuffle_join

    big = spark.range(2000).select(
        F.when(F.col("id") % 3 < 2, 0).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], "k long, name string"
    )
    plain = sorted(map(tuple, big.join(small, "k").select("k", "v", "name").collect()))
    salted = sorted(
        map(
            tuple,
            salted_shuffle_join(big, small, "k").select("k", "v", "name").collect(),
        )
    )
    assert plain == salted


def test_aqe_skew_join_receipt_on_hot_key_fixture(spark):
    """The round-8 skew receipt (BENCH_ATTRIBUTION.md): on a hot-key
    lineitem variant (~80% of rows on one key) with MULTIPLE shuffle
    mappers, Spark 4's AQE skew-join splits the hot partition
    (plan shows skew=true) — and with a SINGLE mapper it provably
    cannot (the split unit is per-mapper shuffle blocks), which is
    when the manual salted_shuffle_join remains the remedy. Also
    gates skew_report's top-n on the same fixture: the planted hot
    key leads with ~800000 ppm."""
    from gcp_dataengineering_spark.ops.skew import skew_report

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    rep = F.explode(F.sequence(F.lit(1), F.lit(16))).alias("r")
    shaped = li.select("l_orderkey", "l_linenumber", "l_extendedprice", rep)
    hot_key = (
        F.when(
            F.xxhash64("l_orderkey", "l_linenumber", "r") % 5 < 3, F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("l_orderkey", "r"), F.lit(10000)) + 1)
        .cast("long")
        .alias("k")
    )
    small = spark.range(0, 10001).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("pay")
    )

    # skew_report gate: the planted key dominates with the exact share
    big1 = shaped.select(hot_key, F.col("l_extendedprice").alias("v"))
    top = skew_report(big1, ["k"], top_n=3).collect()
    n = big1.count()
    n_hot = big1.filter("k = 0").count()
    assert top[0]["k"] == 0 and top[0]["n_rows"] == n_hot
    assert top[0]["share_ppm"] == n_hot * 1_000_000 // n
    assert 700_000 < top[0]["share_ppm"] < 900_000

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")

        def final_plan(big):
            df = big.join(small, "k")
            qe = df._jdf.queryExecution()
            qe.executedPlan().execute().count()
            return qe.executedPlan().toString()

        # multiple mappers -> AQE splits the hot partition
        multi = shaped.repartition(8).select(
            hot_key, F.col("l_extendedprice").alias("v")
        )
        assert "skew=true" in final_plan(multi)
        # single mapper -> nothing to split, marker absent (the
        # documented limit that keeps salted_shuffle_join in the kit)
        single = shaped.coalesce(1).select(
            hot_key, F.col("l_extendedprice").alias("v")
        )
        assert "skew=true" not in final_plan(single)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_write_bucketed_roundtrip(spark):
    # warehouse dir is a static conf — uses the session default
    # (./spark-warehouse, gitignored)
    df = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    write_bucketed(df, "bucketed_t", "k", num_buckets=4)
    try:
        back = spark.table("bucketed_t")
        assert back.count() == 100
        assert back.groupBy("k").count().count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_t")


# ---------------------------------------------------------------- hypothesis
@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=20))
def test_parse_money_property(spark, values):
    """parse_money inverts comma-grouping for any non-negative int."""
    rows = [(f"{v:,}",) for v in values]
    df = spark.createDataFrame(rows, "s string")
    got = [r[0] for r in df.select(parse_money("s").alias("v")).collect()]
    assert got == [float(v) for v in values]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=99), min_size=1, max_size=30))
def test_week_to_month_property(spark, weeks):
    """week→month equals Presto's date-arithmetic result for any week
    (including out-of-range weeks up to 99, since the feed is raw)."""
    import datetime

    df = spark.createDataFrame([(w,) for w in weeks], "week int")
    got = {r["week"]: r["m"] for r in df.select("week", week_to_month("week").alias("m")).collect()}
    for w in set(weeks):
        offset = (w - 1) // 4
        d = datetime.date(2023, 1, 1)
        total = d.month - 1 + offset
        expect = total % 12 + 1
        assert got[w] == expect


# ------------------------------------------------- skew-adversarial near-dup
# VERDICT r2 item 7: a corpus where single keys dominate — every doc
# shares the same boilerplate sentence (stop-shingles with document
# frequency = 100% of the corpus), and a majority clone group that
# collapses into ONE LSH band bucket. The cap + AQE skew-join must
# keep results exactly correct; correctness is pinned against a pure
# Python re-implementation of the capped ground truth.

_BOILERPLATE = "all rights reserved this copyright notice applies everywhere"


def _py_shingles(text, n=3):
    ws = [w for w in text.lower().split() if w]
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _skewed_corpus():
    docs = []
    for i in range(40):
        uniq = " ".join(f"u{i}w{j}" for j in range(10))
        docs.append((i, f"{_BOILERPLATE} {uniq}"))
    for k, base in enumerate(range(100, 106, 2)):
        shared = " ".join(f"c{k}s{j}" for j in range(10))
        docs.append((base, f"{_BOILERPLATE} {shared} onlya{k} trailer"))
        docs.append((base + 1, f"{_BOILERPLATE} {shared} onlyb{k} trailer"))
    return docs


def _py_capped_pairs(docs, cap, n=3):
    """Ground truth: drop shingles with df > cap, then exact pairwise
    Jaccard over the surviving shingle sets — the contract
    ngram_jaccard_pairs(max_shingle_freq=cap) promises."""
    from collections import Counter

    sets = {i: _py_shingles(t, n) for i, t in docs}
    dfc = Counter(s for ss in sets.values() for s in ss)
    kept = {i: {s for s in ss if dfc[s] <= cap} for i, ss in sets.items()}
    out = {}
    ids = sorted(kept)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            common = len(kept[a] & kept[b])
            if common:
                out[(a, b)] = (
                    common,
                    round(common / (len(kept[a]) + len(kept[b]) - common), 9),
                )
    return out


def test_ngram_cap_correct_under_stop_shingle_skew(spark):
    """With one boilerplate sentence in 100% of documents, the capped
    posting-list join must (a) return exactly the Python ground truth
    and (b) generate far fewer pairs than the uncapped join, whose
    stop-shingles pair every document with every other."""
    from gcp_dataengineering_spark.llm_ops.dedup import ngram_jaccard_pairs

    docs = _skewed_corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")

    cap = 5
    got = {
        (r["id_a"], r["id_b"]): (r["common"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(df, max_shingle_freq=cap).collect()
    }
    assert got == _py_capped_pairs(docs, cap)
    # the cap is what bounds the blowup: uncapped, the boilerplate
    # shingles put ALL n*(n-1)/2 document pairs in the candidate set
    n_docs = len(docs)
    uncapped = ngram_jaccard_pairs(df).count()
    assert uncapped == n_docs * (n_docs - 1) // 2
    assert len(got) < uncapped / 10


def test_lsh_majority_clone_bucket_correct(spark):
    """60% of the corpus is one byte-identical clone group — every
    clone lands in the SAME band bucket (maximal band-key skew). The
    bucket join must still return exactly the clone pairs (4/4 shared
    bands, est_jaccard 1.0) and nothing else; AQE skew-join splitting
    (asserted on) is the runtime defense for this shape at scale."""
    from gcp_dataengineering_spark.llm_ops.dedup import minhash_dedup_pairs

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    clone_text = "the same cloned document body repeated verbatim for skew testing"
    docs = [(i, clone_text) for i in range(30)]
    docs += [(100 + i, " ".join(f"z{i}w{j}" for j in range(12))) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r["id_a"], r["id_b"]): (r["shared_bands"], r["est_jaccard"])
        for r in minhash_dedup_pairs(df, num_hashes=8, bands=4).collect()
    }
    expect_keys = {(a, b) for a in range(30) for b in range(a + 1, 30)}
    assert set(got) == expect_keys
    assert all(v == (4, 1.0) for v in got.values())


# ---------------------------------------------------------------- round 6: sketch stats
def test_approx_distinct_stats(spark):
    """HLL corpus stats: within the advertised error band of the
    exact distinct count on real fingerprints, and the plan is ONE
    exchange with a partial sketch below it — vs the exact
    countDistinct plan, whose distinct expansion needs two exchanges
    (every distinct value crosses the wire)."""
    from gcp_dataengineering_spark.llm_ops.corpus import approx_distinct_stats
    from gcp_dataengineering_spark.llm_ops.text import fingerprint

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fp = docs.select("lang", fingerprint("text").alias("fp"))

    approx = approx_distinct_stats(fp, ["lang"], "fp", rsd=0.02)
    exact = fp.groupBy("lang").agg(
        F.countDistinct("fp").alias("n_exact"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    a = {r.lang: r for r in approx.collect()}
    e = {r.lang: r for r in exact.collect()}
    assert set(a) == set(e)
    for lang in a:
        assert a[lang].n_rows == e[lang].n_rows
        err = abs(a[lang].approx_distinct - e[lang].n_exact) / max(e[lang].n_exact, 1)
        assert err <= 0.10, f"{lang}: {err:.3f}"  # 5x the 2% rsd — generous, not tuned

    # executedPlan() after an action renders Final + Initial sections;
    # count exchanges in the final section only
    ap = (
        approx._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    ep = (
        exact._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert ap.count("Exchange hashpartitioning") == 1, ap
    assert "partial_approx_count_distinct" in ap, ap
    assert ep.count("Exchange hashpartitioning") == 2, ep


def test_skew_report_identifies_heavy_keys(spark):
    from gcp_dataengineering_spark.ops.skew import skew_report

    rows = [(i, "hot" if i % 10 != 9 else f"cold{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k string")
    rep = skew_report(df, ["k"], top_n=3).collect()
    assert rep[0].k == "hot" and rep[0].n_rows == 900
    assert rep[0].share_ppm == 900000
    assert all(r.n_rows <= rep[0].n_rows for r in rep)
    # top-n is TakeOrderedAndProject, not a global sort
    plan = skew_report(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
