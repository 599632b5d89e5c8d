"""N-gram language-model perplexity scoring — the CCNet-style
quality signal (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data": documents are bucketed by
the perplexity of a reference n-gram LM; gibberish and boilerplate
score high, fluent prose low). CCNet uses a 5-gram KenLM; this is
the distributed re-expression at bigram order with unigram backoff —
the published filtering recipe's shape, sized to what a SQL oracle
can replay exactly.

Everything is INTEGER fixed-point log2 (the quality_model.py llog2
discipline, FRAC_BITS=16): scores are exact BIGINTs in Spark, DuckDB
and the pure-Python twin, so the whole train+score chain is
oracle-replayable (suite/llm.py ``ngram_perplexity``) and
hash-exact — no float log drift across engines.

Model spec (pinned):
- tokens: lowercase, split on whitespace, empties dropped (the
  repo-wide convention — text.py, dedup.py).
- vocabulary: words with corpus count >= ``min_count``; everything
  else maps to ``<unk>`` BEFORE any n-gram is counted (train and
  score see the same alphabet).
- transitions: consecutive token pairs per document, with a ``<s>``
  begin-of-document context so 1-token documents still score.
- bigram hit:  lp = llog2(c(prev,w)) − llog2(c(prev))
  backoff miss: lp = llog2(c(w)+1) − llog2(U+V) − backoff_bits·2^F
  where c(prev) is the CONTEXT total (Σ_w c(prev,w) — bigram probs
  normalize exactly), c(w) the corpus unigram count (+1 Laplace),
  U total tokens, V vocab size incl. <unk>, and backoff_bits the
  fixed escape penalty (default 4 bits ≈ α=1/16).
- per document: nll_fp = −Σ lp (exact BIGINT),
  ppl_bits = round(nll_fp / (n_trans · 2^F), 4) — bits/token, the
  log2 of perplexity. Zero-token documents surface with n_trans=0
  and NULL ppl_bits (they cannot certify fluency; the gate fails
  them).

Scale design: tokenization is one explode; the vocabulary and every
count table live at distinct-word / distinct-bigram altitude, never
corpus altitude. The one corpus-keyed shuffle is the lag() window
(partitioned by doc_id — bounded per-doc state). Count joins are
key-bucketed equi-joins; the unigram/context tables are broadcast
(vocab-sized). The only driver-side values are two scalars (U, V) —
the documented bounded-collect pattern (model weights / dim stats).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .materialize import MaterializeFn
from .materialize import materialize as _materialize
from .quality_model import FRAC_BITS, llog2, llog2_py, llog2_sql

BOS = "<s>"
UNK = "<unk>"

# ASCII whitespace, written out so all three engines agree exactly:
# Java \s is [ \t\n\x0B\f\r] but RE2 (DuckDB) \s omits \x0B, and
# Python str.split() splits on Unicode whitespace (NBSP,  , …).
_WS_JAVA = "[ \\t\\n\\x0B\\f\\r]+"
_WS_SQL = "[ \\t\\n\\x0B\\f\\r]+"
_WS_PY = re.compile("[ \t\n\x0b\f\r]+")


def _tokens_py(t: str) -> list[str]:
    return [w for w in _WS_PY.split(t.lower()) if w != ""]


def _word_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos, word) — 1-based position, lowercase nonempty
    whitespace tokens."""
    words = F.filter(F.split(F.lower(F.col(text_col)), _WS_JAVA), lambda t: t != "")
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(words).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


def bigram_perplexity(
    docs: DataFrame,
    ref: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    backoff_bits: int = 4,
    frac_bits: int = FRAC_BITS,
    materialize: str | MaterializeFn | bool | None = None,
) -> DataFrame:
    """Train the bigram backoff LM on ``ref`` (default: ``docs``
    itself — the self-scored corpus form the oracle replays) and
    score every document: (doc_id, n_trans, nll_fp, ppl_bits).

    ``nll_fp`` is the exact fixed-point negative log2-likelihood
    (BIGINT — the hash-stable column); ``ppl_bits`` = bits/token,
    the human-facing knob a deployment thresholds on (CCNet buckets
    head/middle/tail on exactly this number).

    Branch points are materialized per the module-wide strategy
    (``materialize``; see llm_ops.materialize): the distinct-word
    table feeds the vocab, the unigram fold AND the totals collect,
    and the mapped transition table feeds both the bigram counts and
    (self-trained) the scoring join — unmaterialized, the corpus
    explode+window lineage would re-run once per consumer (the
    r2 minhash lesson; the un-pinned plan showed 21 exchanges and
    3 duplicate window sorts)."""
    scale = 1 << frac_bits
    train_words = _word_rows(ref if ref is not None else docs, text_col, id_col)
    score_words = train_words if ref is None else _word_rows(docs, text_col, id_col)

    # distinct-word altitude from here down to the count tables;
    # three consumers (vocab filter, unigram fold, totals collect)
    wc = _materialize(
        train_words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")),
        materialize,
    )
    vocab = wc.filter(F.col("cnt") >= min_count).select("word")

    def _mapped(words: DataFrame) -> DataFrame:
        # vocab join is broadcast-hinted like the unigram/bpe vocab
        # joins; at an extreme vocabulary drop the hint and let AQE
        # decide — the join stays a key-bucketed equi-join either way
        return words.join(F.broadcast(vocab.withColumnRenamed("word", "_v")),
                          F.col("word") == F.col("_v"), "left").select(
            "doc_id",
            "pos",
            F.when(F.col("_v").isNotNull(), F.col("word")).otherwise(F.lit(UNK)).alias("token"),
        )

    def _trans(words: DataFrame) -> DataFrame:
        return _mapped(words).select(
            "doc_id",
            "pos",
            "token",
            F.lag("token", 1, BOS).over(
                Window.partitionBy("doc_id").orderBy("pos")
            ).alias("prev"),
        )

    # self-trained: ONE transition table feeds both the count build
    # and the scoring join — pin it so the explode+window runs once
    trans_train = _trans(train_words)
    if ref is None:
        trans_train = _materialize(trans_train, materialize)
        trans_score = trans_train
    else:
        trans_score = _trans(score_words)

    # c2 feeds both c1's derivation and the scoring join — pin the
    # bigram-vocabulary-sized table, not the corpus
    c2 = _materialize(
        trans_train.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("c2")),
        materialize,
    )
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    # unigram counts over MAPPED tokens, derived from the word-count
    # table (no second corpus pass): vocab words keep their count,
    # everything else folds into <unk>
    cu = (
        wc.join(F.broadcast(vocab.withColumnRenamed("word", "_v")),
                F.col("word") == F.col("_v"), "left")
        .select(
            F.when(F.col("_v").isNotNull(), F.col("word")).otherwise(F.lit(UNK)).alias("token"),
            "cnt",
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("cu"))
    )

    # two bounded driver scalars (total tokens, vocab size) — the
    # documented model-stats collect, never corpus data
    totals = wc.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("u"),
        F.coalesce(F.sum((F.col("cnt") >= min_count).cast("long")), F.lit(0)).alias("nv"),
    ).collect()[0]
    u_plus_v = int(totals["u"]) + int(totals["nv"]) + 1  # +1: <unk>
    denom_fp = llog2_py(u_plus_v, frac_bits) if u_plus_v > 0 else 0

    scored = (
        trans_score.join(c2, ["prev", "token"], "left")
        .join(F.broadcast(c1), ["prev"], "left")
        .join(F.broadcast(cu), ["token"], "left")
        .select(
            "doc_id",
            F.when(
                F.col("c2").isNotNull(),
                llog2(F.col("c2"), frac_bits) - llog2(F.col("c1"), frac_bits),
            )
            .otherwise(
                llog2(F.coalesce(F.col("cu"), F.lit(0)) + 1, frac_bits)
                - F.lit(denom_fp)
                - F.lit(backoff_bits * scale)
            )
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trans"), (-F.sum("lp")).alias("nll_fp")
    )
    base = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return base.join(agg, ["doc_id"], "left").select(
        "doc_id",
        F.coalesce(F.col("n_trans"), F.lit(0)).cast("long").alias("n_trans"),
        F.coalesce(F.col("nll_fp"), F.lit(0)).cast("long").alias("nll_fp"),
        F.when(
            F.col("n_trans") > 0,
            F.round(F.col("nll_fp") / (F.col("n_trans") * F.lit(float(scale))), 4),
        ).alias("ppl_bits"),
    )


def perplexity_gate(max_bits: float, ppl_col: str = "ppl_bits") -> Column:
    """Keep-predicate over a bigram_perplexity output (or a frame it
    was joined onto): fluent documents score at most ``max_bits``
    bits/token; NULL (zero-token) documents fail — they cannot
    certify fluency."""
    return F.col(ppl_col).isNotNull() & (F.col(ppl_col) <= F.lit(max_bits))


# ---------------------------------------------------------------- python twin
def bigram_perplexity_py(
    texts: dict[int, str],
    min_count: int = 2,
    backoff_bits: int = 4,
    frac_bits: int = FRAC_BITS,
) -> dict[int, tuple[int, int, float | None]]:
    """Independent pure-Python twin of :func:`bigram_perplexity`
    (self-scored form): {doc_id: (n_trans, nll_fp, ppl_bits)} — the
    parity reference the pytest checks Spark and DuckDB against.

    Rounding: HALF-UP on the double's exact value (Decimal), matching
    Spark's BigDecimal round and DuckDB's ROUND — python's built-in
    round() is banker's and diverges at exact ties like
    598016/(4·65536) = 2.28125 (found by the r16 fuzz session, not by
    the fixture tests: nll/2^F quotients hit .xxxx5 exactly)."""
    from decimal import ROUND_HALF_UP, Decimal

    def _r4(v: float) -> float:
        return float(Decimal(v).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))

    scale = 1 << frac_bits
    toks = {d: _tokens_py(t) for d, t in texts.items()}
    wc: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
    vocab = {w for w, c in wc.items() if c >= min_count}

    def m(w: str) -> str:
        return w if w in vocab else UNK

    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    cu: dict[str, int] = {}
    for w, c in wc.items():
        cu[m(w)] = cu.get(m(w), 0) + c
    for ws in toks.values():
        prev = BOS
        for w in ws:
            t = m(w)
            c2[(prev, t)] = c2.get((prev, t), 0) + 1
            c1[prev] = c1.get(prev, 0) + 1
            prev = t
    u_plus_v = sum(wc.values()) + len(vocab) + 1
    denom = llog2_py(u_plus_v, frac_bits) if u_plus_v > 0 else 0

    out: dict[int, tuple[int, int, float | None]] = {}
    for d, ws in toks.items():
        nll = 0
        n = 0
        prev = BOS
        for w in ws:
            t = m(w)
            if (prev, t) in c2:
                lp = llog2_py(c2[(prev, t)], frac_bits) - llog2_py(c1[prev], frac_bits)
            else:
                lp = (
                    llog2_py(cu.get(t, 0) + 1, frac_bits)
                    - denom
                    - backoff_bits * scale
                )
            nll -= lp
            n += 1
            prev = t
        out[d] = (n, nll, _r4(nll / (n * float(scale))) if n else None)
    return out


# ---------------------------------------------------------------- SQL replay
def bigram_perplexity_sql(
    min_count: int = 2,
    backoff_bits: int = 4,
    frac_bits: int = FRAC_BITS,
    table: str = "documents",
) -> str:
    """DuckDB replay of the self-scored :func:`bigram_perplexity` —
    the suite oracle text. Same vocab fold, same transition window,
    same llog2 fixed-point arithmetic (llog2_sql), same rounding."""
    scale = 1 << frac_bits
    return f"""
WITH words AS (
    SELECT t.doc_id, r.i + 1 AS pos, t.w[r.i + 1] AS word
    FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '{_WS_SQL}'), x -> x <> '') AS w
        FROM {table}
    ) t, unnest(range(len(t.w))) AS r(i)
), wc AS (
    SELECT word, COUNT(*) AS cnt FROM words GROUP BY 1
), vocab AS (
    SELECT word FROM wc WHERE cnt >= {min_count}
), trans AS (
    SELECT w.doc_id, w.pos,
           CASE WHEN v.word IS NOT NULL THEN w.word ELSE '{UNK}' END AS token,
           COALESCE(
               lag(CASE WHEN v.word IS NOT NULL THEN w.word ELSE '{UNK}' END)
                   OVER (PARTITION BY w.doc_id ORDER BY w.pos),
               '{BOS}') AS prev
    FROM words w LEFT JOIN vocab v ON w.word = v.word
), c2 AS (
    SELECT prev, token, COUNT(*) AS c2 FROM trans GROUP BY 1, 2
), c1 AS (
    SELECT prev, SUM(c2) AS c1 FROM c2 GROUP BY 1
), cu AS (
    SELECT CASE WHEN v.word IS NOT NULL THEN wc.word ELSE '{UNK}' END AS token,
           SUM(cnt) AS cu
    FROM wc LEFT JOIN vocab v ON wc.word = v.word GROUP BY 1
), tot AS (
    SELECT COALESCE(SUM(cnt), 0) + (SELECT COUNT(*) FROM vocab) + 1 AS upv FROM wc
), scored AS (
    SELECT t.doc_id,
           CASE WHEN b.c2 IS NOT NULL
                THEN {llog2_sql('b.c2', frac_bits)} - {llog2_sql('x.c1', frac_bits)}
                ELSE {llog2_sql('(COALESCE(u.cu, 0) + 1)', frac_bits)}
                     - {llog2_sql('tot.upv', frac_bits)}
                     - {backoff_bits * scale}
           END AS lp
    FROM trans t
    LEFT JOIN c2 b ON t.prev = b.prev AND t.token = b.token
    LEFT JOIN c1 x ON t.prev = x.prev
    LEFT JOIN cu u ON t.token = u.token
    CROSS JOIN tot
), agg AS (
    SELECT doc_id, COUNT(*) AS n_trans, -SUM(lp) AS nll_fp FROM scored GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_trans, 0) AS BIGINT) AS n_trans,
       CAST(COALESCE(a.nll_fp, 0) AS BIGINT) AS nll_fp,
       CASE WHEN a.n_trans > 0
            THEN ROUND(a.nll_fp / (a.n_trans * {float(scale)}), 4)
       END AS ppl_bits
FROM (SELECT DISTINCT doc_id FROM {table}) d
LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


# ---------------------------------------------------------------- fit / score
def bigram_lm_fit(
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    frac_bits: int = FRAC_BITS,
    materialize: str | MaterializeFn | bool | None = None,
) -> dict:
    """Train the bigram backoff LM ONCE and return it as a model
    dict of plain DataFrames + two scalars — the deployable form of
    the published recipe (CCNet trains on a trusted reference
    corpus, then scores every crawl shard against it): persist the
    frames to parquet, reload anywhere, score any number of corpora
    (incl. per micro-batch inside a foreachBatch hook) without
    re-counting the reference.

    Returns {"vocab", "c2", "c1", "cu", "denom_fp", "frac_bits"} —
    exactly the tables :func:`bigram_perplexity` builds internally;
    :func:`bigram_lm_score` over this model is pytest-pinned EQUAL
    to the one-shot form."""
    words = _word_rows(ref, text_col, id_col)
    wc = _materialize(
        words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")), materialize
    )
    vocab = wc.filter(F.col("cnt") >= min_count).select("word")
    mapped = words.join(
        F.broadcast(vocab.withColumnRenamed("word", "_v")),
        F.col("word") == F.col("_v"),
        "left",
    ).select(
        "doc_id",
        "pos",
        F.when(F.col("_v").isNotNull(), F.col("word")).otherwise(F.lit(UNK)).alias("token"),
    )
    trans = mapped.select(
        "token",
        F.lag("token", 1, BOS).over(
            Window.partitionBy("doc_id").orderBy("pos")
        ).alias("prev"),
    )
    c2 = _materialize(
        trans.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("c2")),
        materialize,
    )
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    cu = (
        wc.join(F.broadcast(vocab.withColumnRenamed("word", "_v")),
                F.col("word") == F.col("_v"), "left")
        .select(
            F.when(F.col("_v").isNotNull(), F.col("word")).otherwise(F.lit(UNK)).alias("token"),
            "cnt",
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("cu"))
    )
    totals = wc.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("u"),
        F.coalesce(F.sum((F.col("cnt") >= min_count).cast("long")), F.lit(0)).alias("nv"),
    ).collect()[0]
    u_plus_v = int(totals["u"]) + int(totals["nv"]) + 1
    return {
        "vocab": vocab,
        "c2": c2,
        "c1": c1,
        "cu": cu,
        "denom_fp": llog2_py(u_plus_v, frac_bits) if u_plus_v > 0 else 0,
        "frac_bits": frac_bits,
    }


def bigram_lm_score(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff_bits: int = 4,
) -> DataFrame:
    """Score a corpus against a :func:`bigram_lm_fit` model — the
    same math as :func:`bigram_perplexity` (pytest-pinned equal),
    with the reference counts read instead of recomputed. Unknown
    context words fold to <unk> through the model's vocab; a context
    the reference never saw backs off to the unigram leg."""
    scale = 1 << model["frac_bits"]
    frac_bits = model["frac_bits"]
    words = _word_rows(docs, text_col, id_col)
    mapped = words.join(
        F.broadcast(model["vocab"].withColumnRenamed("word", "_v")),
        F.col("word") == F.col("_v"),
        "left",
    ).select(
        "doc_id",
        "pos",
        F.when(F.col("_v").isNotNull(), F.col("word")).otherwise(F.lit(UNK)).alias("token"),
    )
    trans = mapped.select(
        "doc_id",
        "token",
        F.lag("token", 1, BOS).over(
            Window.partitionBy("doc_id").orderBy("pos")
        ).alias("prev"),
    )
    scored = (
        trans.join(model["c2"], ["prev", "token"], "left")
        .join(F.broadcast(model["c1"]), ["prev"], "left")
        .join(F.broadcast(model["cu"]), ["token"], "left")
        .select(
            "doc_id",
            F.when(
                F.col("c2").isNotNull(),
                llog2(F.col("c2"), frac_bits) - llog2(F.col("c1"), frac_bits),
            )
            .otherwise(
                llog2(F.coalesce(F.col("cu"), F.lit(0)) + 1, frac_bits)
                - F.lit(model["denom_fp"])
                - F.lit(backoff_bits * scale)
            )
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trans"), (-F.sum("lp")).alias("nll_fp")
    )
    base = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return base.join(agg, ["doc_id"], "left").select(
        "doc_id",
        F.coalesce(F.col("n_trans"), F.lit(0)).cast("long").alias("n_trans"),
        F.coalesce(F.col("nll_fp"), F.lit(0)).cast("long").alias("nll_fp"),
        F.when(
            F.col("n_trans") > 0,
            F.round(F.col("nll_fp") / (F.col("n_trans") * F.lit(float(scale))), 4),
        ).alias("ppl_bits"),
    )


# ---------------------------------------------------------------- trigram order
def trigram_perplexity(
    docs: DataFrame,
    ref: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    backoff_bits_bi: int = 4,
    backoff_bits_uni: int = 8,
    frac_bits: int = FRAC_BITS,
    materialize: str | MaterializeFn | bool | None = None,
) -> DataFrame:
    """Trigram backoff LM — one order closer to CCNet's 5-gram while
    staying fully SQL-replayable. Same vocab fold and <s> padding as
    the bigram form (position i scores against (u, v) =
    (tok[i−2] or <s>, tok[i−1] or <s>)); the backoff chain is
    tri → bi → uni with fixed escape penalties (β_bi for the first
    escape, β_uni for the second; β_uni > β_bi — a doc that falls
    all the way to unigrams is less fluent than one caught by the
    bigram net):

      c3(u,v,w) > 0:  lp = llog2(c3) − llog2(c3ctx(u,v))
      c2(v,w)  > 0:  lp = llog2(c2) − llog2(c2ctx(v)) − β_bi·2^F
      else:          lp = llog2(cu(w)+1) − llog2(U+V) − β_uni·2^F

    Outputs the bigram form's exact shape (doc_id, n_trans, nll_fp,
    ppl_bits). Scale story identical: corpus touched once (pinned),
    count tables at n-gram-vocabulary altitude, c3/c2 joins
    key-bucketed, contexts/unigrams broadcast, two driver scalars."""
    scale = 1 << frac_bits
    train_words = _word_rows(ref if ref is not None else docs, text_col, id_col)
    score_words = train_words if ref is None else _word_rows(docs, text_col, id_col)

    wc = _materialize(
        train_words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")),
        materialize,
    )
    vocab = wc.filter(F.col("cnt") >= min_count).select("word")

    def _mapped(words: DataFrame) -> DataFrame:
        return words.join(
            F.broadcast(vocab.withColumnRenamed("word", "_v")),
            F.col("word") == F.col("_v"),
            "left",
        ).select(
            "doc_id",
            "pos",
            F.when(F.col("_v").isNotNull(), F.col("word")).otherwise(F.lit(UNK)).alias("token"),
        )

    def _trans(words: DataFrame) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy("pos")
        return _mapped(words).select(
            "doc_id",
            "token",
            F.lag("token", 1, BOS).over(w).alias("prev"),
            F.lag("token", 2, BOS).over(w).alias("prev2"),
        )

    trans_train = _trans(train_words)
    if ref is None:
        trans_train = _materialize(trans_train, materialize)
        trans_score = trans_train
    else:
        trans_score = _trans(score_words)

    c3 = _materialize(
        trans_train.groupBy("prev2", "prev", "token").agg(
            F.count(F.lit(1)).alias("c3")
        ),
        materialize,
    )
    c3ctx = c3.groupBy("prev2", "prev").agg(F.sum("c3").alias("c3ctx"))
    c2 = _materialize(
        trans_train.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("c2")),
        materialize,
    )
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    cu = (
        wc.join(F.broadcast(vocab.withColumnRenamed("word", "_v")),
                F.col("word") == F.col("_v"), "left")
        .select(
            F.when(F.col("_v").isNotNull(), F.col("word")).otherwise(F.lit(UNK)).alias("token"),
            "cnt",
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("cu"))
    )
    totals = wc.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("u"),
        F.coalesce(F.sum((F.col("cnt") >= min_count).cast("long")), F.lit(0)).alias("nv"),
    ).collect()[0]
    u_plus_v = int(totals["u"]) + int(totals["nv"]) + 1
    denom_fp = llog2_py(u_plus_v, frac_bits) if u_plus_v > 0 else 0

    scored = (
        trans_score.join(c3, ["prev2", "prev", "token"], "left")
        .join(c3ctx, ["prev2", "prev"], "left")
        .join(c2, ["prev", "token"], "left")
        .join(F.broadcast(c1), ["prev"], "left")
        .join(F.broadcast(cu), ["token"], "left")
        .select(
            "doc_id",
            F.when(
                F.col("c3").isNotNull(),
                llog2(F.col("c3"), frac_bits) - llog2(F.col("c3ctx"), frac_bits),
            )
            .when(
                F.col("c2").isNotNull(),
                llog2(F.col("c2"), frac_bits)
                - llog2(F.col("c1"), frac_bits)
                - F.lit(backoff_bits_bi * scale),
            )
            .otherwise(
                llog2(F.coalesce(F.col("cu"), F.lit(0)) + 1, frac_bits)
                - F.lit(denom_fp)
                - F.lit(backoff_bits_uni * scale)
            )
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trans"), (-F.sum("lp")).alias("nll_fp")
    )
    base = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return base.join(agg, ["doc_id"], "left").select(
        "doc_id",
        F.coalesce(F.col("n_trans"), F.lit(0)).cast("long").alias("n_trans"),
        F.coalesce(F.col("nll_fp"), F.lit(0)).cast("long").alias("nll_fp"),
        F.when(
            F.col("n_trans") > 0,
            F.round(F.col("nll_fp") / (F.col("n_trans") * F.lit(float(scale))), 4),
        ).alias("ppl_bits"),
    )


def trigram_perplexity_py(
    texts: dict[int, str],
    min_count: int = 2,
    backoff_bits_bi: int = 4,
    backoff_bits_uni: int = 8,
    frac_bits: int = FRAC_BITS,
) -> dict[int, tuple[int, int, float | None]]:
    """Pure-Python twin of the self-scored :func:`trigram_perplexity`
    (half-up rounding, like the bigram twin after the r16 fuzz
    find)."""
    from decimal import ROUND_HALF_UP, Decimal

    def _r4(v: float) -> float:
        return float(Decimal(v).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))

    scale = 1 << frac_bits
    toks = {d: _tokens_py(t) for d, t in texts.items()}
    wc: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
    vocab = {w for w, c in wc.items() if c >= min_count}

    def m(w: str) -> str:
        return w if w in vocab else UNK

    c3: dict[tuple[str, str, str], int] = {}
    c3ctx: dict[tuple[str, str], int] = {}
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    cu: dict[str, int] = {}
    for w, c in wc.items():
        cu[m(w)] = cu.get(m(w), 0) + c
    for ws in toks.values():
        u, v = BOS, BOS
        for w in ws:
            t = m(w)
            c3[(u, v, t)] = c3.get((u, v, t), 0) + 1
            c3ctx[(u, v)] = c3ctx.get((u, v), 0) + 1
            c2[(v, t)] = c2.get((v, t), 0) + 1
            c1[v] = c1.get(v, 0) + 1
            u, v = v, t
    u_plus_v = sum(wc.values()) + len(vocab) + 1
    denom = llog2_py(u_plus_v, frac_bits) if u_plus_v > 0 else 0

    out: dict[int, tuple[int, int, float | None]] = {}
    for d, ws in toks.items():
        nll = 0
        n = 0
        u, v = BOS, BOS
        for w in ws:
            t = m(w)
            if (u, v, t) in c3:
                lp = llog2_py(c3[(u, v, t)], frac_bits) - llog2_py(c3ctx[(u, v)], frac_bits)
            elif (v, t) in c2:
                lp = (
                    llog2_py(c2[(v, t)], frac_bits)
                    - llog2_py(c1[v], frac_bits)
                    - backoff_bits_bi * scale
                )
            else:
                lp = (
                    llog2_py(cu.get(t, 0) + 1, frac_bits)
                    - denom
                    - backoff_bits_uni * scale
                )
            nll -= lp
            n += 1
            u, v = v, t
        out[d] = (n, nll, _r4(nll / (n * float(scale))) if n else None)
    return out


def trigram_perplexity_sql(
    min_count: int = 2,
    backoff_bits_bi: int = 4,
    backoff_bits_uni: int = 8,
    frac_bits: int = FRAC_BITS,
    table: str = "documents",
) -> str:
    """DuckDB replay of the self-scored :func:`trigram_perplexity` —
    two lag windows, three count tables, the tri→bi→uni escape chain
    in llog2 arithmetic."""
    scale = 1 << frac_bits
    return f"""
WITH words AS (
    SELECT t.doc_id, r.i + 1 AS pos, t.w[r.i + 1] AS word
    FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '{_WS_SQL}'), x -> x <> '') AS w
        FROM {table}
    ) t, unnest(range(len(t.w))) AS r(i)
), wc AS (
    SELECT word, COUNT(*) AS cnt FROM words GROUP BY 1
), vocab AS (
    SELECT word FROM wc WHERE cnt >= {min_count}
), trans AS (
    SELECT w.doc_id, w.pos,
           CASE WHEN v.word IS NOT NULL THEN w.word ELSE '{UNK}' END AS token,
           COALESCE(
               lag(CASE WHEN v.word IS NOT NULL THEN w.word ELSE '{UNK}' END)
                   OVER (PARTITION BY w.doc_id ORDER BY w.pos),
               '{BOS}') AS prev,
           COALESCE(
               lag(CASE WHEN v.word IS NOT NULL THEN w.word ELSE '{UNK}' END, 2)
                   OVER (PARTITION BY w.doc_id ORDER BY w.pos),
               '{BOS}') AS prev2
    FROM words w LEFT JOIN vocab v ON w.word = v.word
), c3 AS (
    SELECT prev2, prev, token, COUNT(*) AS c3 FROM trans GROUP BY 1, 2, 3
), c3ctx AS (
    SELECT prev2, prev, SUM(c3) AS c3ctx FROM c3 GROUP BY 1, 2
), c2 AS (
    SELECT prev, token, COUNT(*) AS c2 FROM trans GROUP BY 1, 2
), c1 AS (
    SELECT prev, SUM(c2) AS c1 FROM c2 GROUP BY 1
), cu AS (
    SELECT CASE WHEN v.word IS NOT NULL THEN wc.word ELSE '{UNK}' END AS token,
           SUM(cnt) AS cu
    FROM wc LEFT JOIN vocab v ON wc.word = v.word GROUP BY 1
), tot AS (
    SELECT COALESCE(SUM(cnt), 0) + (SELECT COUNT(*) FROM vocab) + 1 AS upv FROM wc
), scored AS (
    SELECT t.doc_id,
           CASE WHEN t3.c3 IS NOT NULL
                THEN {llog2_sql('t3.c3', frac_bits)} - {llog2_sql('x3.c3ctx', frac_bits)}
                WHEN b.c2 IS NOT NULL
                THEN {llog2_sql('b.c2', frac_bits)} - {llog2_sql('x.c1', frac_bits)}
                     - {backoff_bits_bi * scale}
                ELSE {llog2_sql('(COALESCE(u.cu, 0) + 1)', frac_bits)}
                     - {llog2_sql('tot.upv', frac_bits)}
                     - {backoff_bits_uni * scale}
           END AS lp
    FROM trans t
    LEFT JOIN c3 t3 ON t.prev2 = t3.prev2 AND t.prev = t3.prev AND t.token = t3.token
    LEFT JOIN c3ctx x3 ON t.prev2 = x3.prev2 AND t.prev = x3.prev
    LEFT JOIN c2 b ON t.prev = b.prev AND t.token = b.token
    LEFT JOIN c1 x ON t.prev = x.prev
    LEFT JOIN cu u ON t.token = u.token
    CROSS JOIN tot
), agg AS (
    SELECT doc_id, COUNT(*) AS n_trans, -SUM(lp) AS nll_fp FROM scored GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_trans, 0) AS BIGINT) AS n_trans,
       CAST(COALESCE(a.nll_fp, 0) AS BIGINT) AS nll_fp,
       CASE WHEN a.n_trans > 0
            THEN ROUND(a.nll_fp / (a.n_trans * {float(scale)}), 4)
       END AS ppl_bits
FROM (SELECT DISTINCT doc_id FROM {table}) d
LEFT JOIN agg a ON d.doc_id = a.doc_id
"""
