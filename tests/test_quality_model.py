"""Model-based quality classifier (llm_ops/quality_model.py, r12):
hashed-n-gram Naive Bayes with integer fixed-point log2 — trained
and scored as DataFrame ops, bit-exact across Spark / DuckDB /
pure Python."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from gcp_dataengineering_spark.llm_ops.quality_model import (
    CHAR_NGRAM_MODE,
    FRAC_BITS,
    NB_WORD_PATTERN,
    _hashed_tokens_py,
    llog2,
    llog2_py,
    llog2_sql,
    nb_quality_gate,
    nb_score,
    nb_train,
    nb_train_py,
)


def test_llog2_three_way_parity_and_properties(spark):
    """llog2 (Spark) == llog2_sql (DuckDB) == llog2_py on powers of
    two, off-by-ones, small ints and random 62-bit values; monotone;
    exact at powers of two; within the documented 0.0861·2^F error
    of true log2 everywhere."""
    import math

    rng = random.Random(20260815)
    xs = sorted(
        set(
            list(range(1, 200))
            + [2**k for k in range(63)]
            + [2**k - 1 for k in range(2, 63)]
            + [2**k + 1 for k in range(2, 62)]
            + [rng.randrange(1, 2**62) for _ in range(200)]
        )
    )
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r.x: r.l for r in df.select("x", llog2(F.col("x")).alias("l")).collect()}
    con = duckdb.connect()
    expr = llog2_sql("x")
    sql_got = {
        x: con.execute(f"SELECT {expr} FROM (SELECT ?::BIGINT AS x)", [x]).fetchone()[0]
        for x in xs
    }
    s = 1 << FRAC_BITS
    prev = None
    for x in xs:
        want = llog2_py(x)
        assert got[x] == want, (x, got[x], want)
        assert sql_got[x] == want, (x, sql_got[x], want)
        if x & (x - 1) == 0:  # power of two: exact
            assert want == (x.bit_length() - 1) * s
        assert abs(want / s - math.log2(x)) <= 0.0862
        if prev is not None:
            assert want >= prev
        prev = want
    with pytest.raises(ValueError):
        llog2_py(0)


def test_nb_train_matches_python_reference_exactly(spark):
    """The Spark trainer's dense model frame (counts, weights,
    prior) equals the independent pure-Python reference row for row
    — the falsification harness for the in-engine aggregation."""
    ham = [
        f"the quick brown fox jumps over the lazy dog article {i} with "
        "plain readable prose and complete sentences"
        for i in range(25)
    ]
    spam = [
        f"click here free casino bonus winner jackpot lottery prize {i} "
        "claim now limited offer act fast"
        for i in range(35)  # deliberately unbalanced: prior != 0
    ]
    rows = [(t, 1) for t in ham] + [(t, 0) for t in spam]
    labeled = spark.createDataFrame(rows, "text string, label int")
    B = 256
    model = nb_train(labeled, num_buckets=B)
    ref = nb_train_py(rows, num_buckets=B)
    got = {r.bucket: r for r in model.collect()}
    assert len(got) == B  # dense: every bucket present exactly once
    for b in range(B):
        assert (got[b].c1, got[b].c0, got[b].weight, got[b].prior) == (
            ref["c1"][b],
            ref["c0"][b],
            ref["weights"][b],
            ref["prior"],
        ), b
    assert ref["prior"] != 0  # unbalanced classes produce a real prior

    # missing class rejected
    with pytest.raises(ValueError, match="both classes"):
        nb_train(spark.createDataFrame([("x", 1)], "text string, label int"))


def test_nb_classifier_accuracy_floor_on_held_out_docs(spark):
    """Train on 60% of a planted two-class corpus (shared filler
    vocabulary + class-specific vocabulary, randomized word order
    and lengths), score the HELD-OUT 40%: accuracy must clear 0.95
    — the honest capability statement for the fixture, mirroring
    the lang_id measured-accuracy convention."""
    rng = random.Random(7)
    shared = ["about", "into", "over", "after", "world", "report", "new",
              "time", "people", "year", "day", "many", "make", "see"]
    hamv = ["analysis", "research", "evidence", "chapter", "history",
            "science", "novel", "detailed", "thorough", "literature"]
    spamv = ["casino", "jackpot", "viagra", "lottery", "unsubscribe",
             "winner", "bonus", "promo", "freebie", "clickbait"]

    def doc(vocab):
        n = rng.randint(10, 40)
        pool = shared + vocab
        return " ".join(rng.choice(pool) for _ in range(n))

    rows = [(i, doc(hamv), 1) for i in range(100)] + [
        (100 + i, doc(spamv), 0) for i in range(100)
    ]
    rng.shuffle(rows)
    train = rows[:120]
    test = rows[120:]
    assert {y for _, _, y in train} == {0, 1}
    labeled = spark.createDataFrame(
        [(t, y) for _, t, y in train], "text string, label int"
    )
    model = nb_train(labeled, num_buckets=512)
    scored = nb_score(
        spark.createDataFrame([(i, t) for i, t, _ in test], "id long, text string"),
        model,
    )
    got = {r.id: r.nbq_score for r in scored.collect()}
    want = {i: y for i, _, y in test}
    acc = sum((got[i] > 0) == (want[i] == 1) for i in got) / len(got)
    assert acc >= 0.95, acc
    # the gate keeps exactly the score>threshold rows
    kept = {
        r.id
        for r in nb_quality_gate(
            spark.createDataFrame(
                [(i, t) for i, t, _ in test], "id long, text string"
            ),
            model,
        ).collect()
    }
    assert kept == {i for i in got if got[i] > 0}


def test_nb_score_zero_shuffle_plan(spark):
    """Scoring is a pure row map: the physical plan must carry the
    1-row weight frame via a broadcast nested-loop join and contain
    NO hash-partition exchange / sort-merge join on the corpus side
    (the 100 TB shape receipt)."""
    labeled = spark.createDataFrame(
        [("good fine text", 1), ("bad spam text", 0)] * 3,
        "text string, label int",
    )
    # materialize the model so the scoring plan is isolated from the
    # training aggregations
    model_rows = nb_train(labeled, num_buckets=64).collect()
    model = spark.createDataFrame(
        model_rows, "bucket long, c1 long, c0 long, weight long, prior long"
    )
    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(10)], "id long, text string"
    )
    plan = nb_score(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning" not in plan


def test_nb_empty_and_null_text_score_prior(spark):
    """Tokenless text contributes no evidence: score == prior
    exactly (and never NULL)."""
    labeled = spark.createDataFrame(
        [("alpha beta", 1)] * 4 + [("gamma delta", 0)] * 2,
        "text string, label int",
    )
    model = nb_train(labeled, num_buckets=32)
    prior = nb_train_py(
        [("alpha beta", 1)] * 4 + [("gamma delta", 0)] * 2, num_buckets=32
    )["prior"]
    out = nb_score(
        spark.createDataFrame([(1, ""), (2, "12345 !!!")], "id int, text string"),
        model,
    ).collect()
    assert {r.nbq_score for r in out} == {prior}


def test_hashed_tokens_py_matches_spark_hashing(spark):
    """The python twin's tokenize+hash equals the Spark column
    expression (same md5-60bit, same salt separator, same split)."""
    from gcp_dataengineering_spark.llm_ops.quality_model import (
        hashed_token_buckets,
    )

    texts = [
        "The QUICK brown-fox; jumps_over 123 the lazy dog",
        "", "   ", "ümlaut mixed café text", "a b c a b c",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r.i: r.h
        for r in df.select(
            "i", hashed_token_buckets("t", 97, salt="s").alias("h")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _hashed_tokens_py(t, 97, "s", "[^a-z]+"), t


def test_nb_bigram_features_parity_and_discrimination(spark):
    """ngrams=2 (r12): the word-bigram feature pass matches the
    pure-Python twin exactly (train + score), and gives the linear
    model local word order a bag of words cannot see — 'not good' vs
    'good' docs separate only in bigram mode when the unigram
    marginals are engineered to be identical across classes."""
    from gcp_dataengineering_spark.llm_ops.quality_model import (
        _hashed_tokens_py,
        hashed_token_buckets,
        nb_score,
        nb_train,
        nb_train_py,
    )

    # unigram-identical classes: both contain the same multiset of
    # words per doc; only adjacency differs
    ham = ["this is good not bad really"] * 12
    spam = ["this is not good bad really"] * 12
    rows = [(t, 1) for t in ham] + [(t, 0) for t in spam]
    labeled = spark.createDataFrame(rows, "text string, label int")
    B = 128

    # unigram mode: weights all ~0 between classes (same marginals)
    uni = nb_train(labeled, num_buckets=B, ngrams=1)
    uref = nb_train_py(rows, num_buckets=B, ngrams=1)
    got = {r.bucket: (r.c1, r.c0, r.weight) for r in uni.collect()}
    assert all(
        got[b] == (uref["c1"][b], uref["c0"][b], uref["weights"][b])
        for b in range(B)
    )
    assert all(c1 == c0 for c1, c0, _ in got.values())  # marginals equal

    # bigram mode: exact python parity + real separation
    bi = nb_train(labeled, num_buckets=B, ngrams=2)
    bref = nb_train_py(rows, num_buckets=B, ngrams=2)
    gotb = {r.bucket: (r.c1, r.c0, r.weight) for r in bi.collect()}
    assert all(
        gotb[b] == (bref["c1"][b], bref["c0"][b], bref["weights"][b])
        for b in range(B)
    )
    test = spark.createDataFrame(
        [(1, "good not bad"), (2, "not good bad")], "id int, text string"
    )
    s_uni = {r.id: r.nbq_score for r in nb_score(test, uni, ngrams=1).collect()}
    s_bi = {r.id: r.nbq_score for r in nb_score(test, bi, ngrams=2).collect()}
    assert s_uni[1] == s_uni[2]  # bag of words is blind here
    assert s_bi[1] > 0 > s_bi[2]  # bigrams separate

    # the python hashing twin mirrors the Spark expression in ngram mode
    texts = ["a b c", "", "one two", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    gh = {
        r.i: r.h
        for r in df.select(
            "i", hashed_token_buckets("t", 97, salt="s", ngrams=2).alias("h")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert gh[i] == _hashed_tokens_py(t, 97, "s", "[^a-z]+", ngrams=2), t

    import pytest as _pytest

    with _pytest.raises(ValueError, match="ngrams"):
        nb_score(test, bi, ngrams=3)
    with _pytest.raises(ValueError, match="ngrams"):
        hashed_token_buckets("t", 97, ngrams=0)


def test_nb_calibrate_threshold_exact_vs_bruteforce(spark):
    """r12 calibration: the picked threshold equals the brute-force
    'smallest t with precision(score > t) >= target and tp > 0'
    over the collected scores — exact integer verdicts, ppm columns
    by integer division; a trivially separable set calibrates to the
    all-keep candidate (full recall); an unreachable target returns
    the all-NULL row; invalid targets are rejected."""
    from gcp_dataengineering_spark.llm_ops.quality_model import (
        nb_calibrate_threshold,
        nb_score,
        nb_train,
    )

    rng = random.Random(3)
    shared = ["about", "into", "over", "world", "report", "time", "year"]
    hamv = ["analysis", "research", "evidence", "chapter", "science"]
    spamv = ["casino", "jackpot", "lottery", "winner", "promo"]

    def doc(vocab, mix):
        # `mix` controls class overlap so precision < 100% at low
        # thresholds — calibration has something real to do
        pool = shared + vocab + (spamv if mix else [])
        return " ".join(rng.choice(pool) for _ in range(rng.randint(8, 25)))

    train_rows = [(doc(hamv, False), 1) for _ in range(60)] + [
        (doc(spamv, False), 0) for _ in range(60)
    ]
    val_rows = [(doc(hamv, i % 3 == 0), 1) for i in range(50)] + [
        (doc(spamv, False), 0) for _ in range(50)
    ]
    model = nb_train(
        spark.createDataFrame(train_rows, "text string, label int"),
        num_buckets=256,
    )
    val = spark.createDataFrame(val_rows, "text string, label int")

    scored = nb_score(val, model, out_col="s").select("s", "label").collect()
    pairs = [(r.s, r.label) for r in scored]

    def brute(target):
        cands = sorted({s for s, _ in pairs}) + [min(s for s, _ in pairs) - 1]
        best = None
        for t in cands:
            tp = sum(1 for s, y in pairs if s > t and y == 1)
            fp = sum(1 for s, y in pairs if s > t and y == 0)
            if tp > 0 and tp * 100 >= target * (tp + fp):
                if best is None or t < best[0]:
                    best = (t, tp, fp)
        return best

    for target in (50, 80, 90, 99, 100):
        got = nb_calibrate_threshold(val, model, target).collect()[0]
        want = brute(target)
        if want is None:
            assert got.threshold is None, (target, got)
            continue
        assert (got.threshold, got.tp, got.fp) == want, (target, got, want)
        total_pos = sum(1 for _, y in pairs if y == 1)
        assert got.fn == total_pos - want[1]
        assert got.precision_ppm == want[1] * 1_000_000 // (want[1] + want[2])
        assert got.recall_ppm == want[1] * 1_000_000 // total_pos
        # the verdict really holds on the frame itself
        assert got.precision_ppm >= target * 10_000

    # perfectly separable validation → the all-keep candidate wins
    sep = spark.createDataFrame(
        [("analysis research evidence", 1)] * 10
        + [("casino jackpot lottery", 0)] * 10,
        "text string, label int",
    )
    row = nb_calibrate_threshold(sep, model, 100).collect()[0]
    assert row.recall_ppm == 1_000_000
    assert row.precision_ppm == 1_000_000

    import pytest as _pytest

    with _pytest.raises(ValueError, match="target_precision_pct"):
        nb_calibrate_threshold(val, model, 0)


def test_llog2_py_hypothesis_property():
    """Pure-python hypothesis property (no Spark): llog2 is monotone
    non-decreasing, exact at powers of two, within the documented
    0.0861·2^F bound of true log2, and additive within the bound for
    products that stay in range — the properties NB weight ordering
    actually relies on."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gcp_dataengineering_spark.llm_ops.quality_model import (
        FRAC_BITS,
        llog2_py,
    )

    s = 1 << FRAC_BITS

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=1, max_value=2**62 - 1),
        st.integers(min_value=1, max_value=2**62 - 1),
    )
    def prop(a, b):
        la, lb = llog2_py(a), llog2_py(b)
        if a <= b:
            assert la <= lb
        else:
            assert la >= lb
        assert abs(la / s - math.log2(a)) <= 0.0862
        if a.bit_length() + b.bit_length() <= 62:
            # log(ab) ≈ log(a)+log(b) within twice the octave bound
            assert abs(llog2_py(a * b) - (la + lb)) <= 2 * 0.0862 * s + 2

    prop()


def test_nb_plan_shape_at_scale(spark):
    """×20 scale-shape gate (the bpe_encode convention): replicate
    the labeled frame ×20 and run train→score end to end — the
    executed plan must stay broadcast-shaped (no CartesianProduct,
    no SortMergeJoin) and the only corpus-side exchange is the
    bucket-keyed training aggregation, never a corpus-keyed shuffle
    on the scoring path."""
    labeled = spark.createDataFrame(
        [(f"doc {i} alpha beta text words here", i % 2) for i in range(40)],
        "text string, label int",
    )
    big = labeled.withColumn(
        "_rep", F.explode(F.sequence(F.lit(0), F.lit(19)))
    ).drop("_rep")
    model = nb_train(big, num_buckets=512)
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc {i}") for i in range(200)],
        "id long, text string",
    )
    scored = nb_score(docs, model)
    assert scored.count() == 200
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # scoring side: the only join is the 1-row broadcast nested loop
    assert "BroadcastNestedLoopJoin" in plan


def test_nb_score_rejects_damaged_model_frame(spark):
    """r12 ADVICE: nb_score infers the modulus from count(model
    rows), so a model frame that lost, duplicated, or shifted rows
    must FAIL LOUDLY instead of silently mis-bucketing every token."""
    labeled = spark.createDataFrame(
        [("alpha beta gamma", 1)] * 4 + [("delta epsilon", 0)] * 3,
        "text string, label int",
    )
    model = nb_train(labeled, num_buckets=32)
    docs = spark.createDataFrame([(1, "alpha beta")], "id long, text string")

    # intact model scores fine
    assert nb_score(docs, model).count() == 1

    # lost rows (accidental filter / partial read)
    with pytest.raises(Exception, match="dense bucket table"):
        nb_score(docs, model.filter(F.col("bucket") != 7)).collect()

    # duplicated + dropped rows such that count == max+1 and
    # min == 0 still hold — only the DISTINCT facet catches it
    dup = model.filter(F.col("bucket") != 5).unionByName(
        model.filter(F.col("bucket") == 3)
    )
    with pytest.raises(Exception, match="dense bucket table"):
        nb_score(docs, dup).collect()

    # shifted bucket ids (min != 0)
    with pytest.raises(Exception, match="dense bucket table"):
        nb_score(
            docs, model.withColumn("bucket", F.col("bucket") + 1)
        ).collect()


def test_nb_char_ngram_mode_matches_python_twin(spark):
    """r13: the char3_5 feature mode — training weights and scores
    must still match the independent pure-Python twin exactly."""
    rows = [
        ("a fine and thoughtful article about science", 1),
        ("the measured essay explains the method well", 1),
        ("win free money now click here fast", 0),
        ("f.r.e.e m0ney w1n n0w!!!", 0),
    ] * 3
    labeled = spark.createDataFrame(rows, "text string, label int")
    model = nb_train(labeled, num_buckets=128, ngrams=CHAR_NGRAM_MODE)
    twin = nb_train_py(rows, num_buckets=128, ngrams=CHAR_NGRAM_MODE)
    got = {r.bucket: (r.c1, r.c0, r.weight, r.prior) for r in model.collect()}
    assert len(got) == 128
    for b in range(128):
        assert got[b][0] == twin["c1"][b], b
        assert got[b][1] == twin["c0"][b], b
        assert got[b][2] == twin["weights"][b], b
        assert got[b][3] == twin["prior"], b
    docs = spark.createDataFrame(
        [(1, "free money article"), (2, ""), (3, "f.r.e.e!!")],
        "id long, text string",
    )
    scored = {
        r.id: r.nbq_score
        for r in nb_score(docs, model, ngrams=CHAR_NGRAM_MODE).collect()
    }
    for rid, text in [(1, "free money article"), (2, ""), (3, "f.r.e.e!!")]:
        exp = twin["prior"] + sum(
            twin["weights"][b]
            for b in _hashed_tokens_py(
                text, 128, "nbq", NB_WORD_PATTERN, CHAR_NGRAM_MODE
            )
        )
        assert scored[rid] == exp, (rid, scored[rid], exp)


def test_nb_char_ngrams_catch_obfuscated_spam(spark):
    """The fixture the r12 verdict asked for: spam whose words are
    letter-obfuscated ("f.r.e.e m0ney") evades the WORD model (its
    tokens shatter into unseen fragments) but not the char-3-5-gram
    model — measured accuracy floor on a held-out obfuscated set."""
    import random

    rng = random.Random(13)
    ham_words = ("science method results article careful study data "
                 "analysis clear evidence review long detailed").split()
    spam_obf = ["f.r.e.e", "m0ney", "w1n", "n0w", "cl1ck", "b0nus",
                "pr1ze", "v1agra", "ca$h", "l0an"]
    train = []
    for i in range(60):
        train.append((" ".join(rng.sample(ham_words, 6)), 1))
        train.append((" ".join(rng.sample(spam_obf, 4)) + "!!!", 0))
    test_rows = []
    for i in range(30):
        test_rows.append((" ".join(rng.sample(ham_words, 5)), 1))
        # held-out obfuscations: NEW dotted/digit variants built from
        # the same character patterns
        test_rows.append((" ".join(rng.sample(spam_obf, 3)) + " fr.ee m.0ney", 0))
    labeled = spark.createDataFrame(train, "text string, label int")
    test = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(test_rows)],
        "id long, text string, label int",
    )
    acc = {}
    for mode in (1, CHAR_NGRAM_MODE):
        model = nb_train(labeled, num_buckets=1024, ngrams=mode)
        scored = nb_score(test, model, ngrams=mode).collect()
        acc[mode] = sum(
            1 for r in scored if (r.nbq_score > 0) == (r.label == 1)
        ) / len(scored)
    assert acc[CHAR_NGRAM_MODE] >= 0.95, acc
    assert acc[CHAR_NGRAM_MODE] >= acc[1], acc
