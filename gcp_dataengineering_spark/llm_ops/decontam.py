"""Eval-set decontamination: flag training documents that share word
n-grams with a held-out evaluation set — the standard pre-training
hygiene step (benchmark answers leaking into the training corpus
inflate eval scores; every published pipeline n-gram-filters for it,
typically with 8-13-gram overlap).

Shape at scale: a posting-list equi-join on the n-gram — the train
side explodes to (doc_id, gram) rows, the (much smaller) eval side to
(gram, eval_id) rows, and candidates are gram-key join hits. Never
all-pairs; the eval side usually broadcasts outright. Ultra-common
grams can be capped exactly like dedup's stop-shingles
(``max_gram_freq``) so a boilerplate phrase can't explode the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows
from .materialize import MaterializeFn
from .materialize import materialize as _materialize


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_shared: int = 1,
    max_gram_freq: int | None = None,
    materialize: str | MaterializeFn | bool | None = None,
) -> DataFrame:
    """(doc_id, n_shared_grams, n_eval_docs) for every train document
    sharing ≥ ``min_shared`` distinct word n-grams with the eval set:
    ``n_shared_grams`` counts the train doc's distinct contaminated
    grams, ``n_eval_docs`` the distinct eval documents hit.

    ``max_gram_freq`` drops grams appearing in more than that many
    EVAL documents before joining (the stop-shingle guard — at 100 TB
    a boilerplate license header in the eval set would otherwise fan
    out against every train document containing it)."""
    tr = shingle_rows(train, text_col, id_col, n)
    ev = shingle_rows(eval_df, text_col, id_col, n).select(
        "shingle", F.col("doc_id").alias("eval_id")
    )
    if max_gram_freq is not None:
        freq = ev.groupBy("shingle").agg(
            F.count_distinct("eval_id").alias("ev_df")
        )
        ev = ev.join(
            freq.filter(F.col("ev_df") <= max_gram_freq), "shingle"
        ).drop("ev_df")
    # The eval posting list is consumed once; the join output feeds a
    # single aggregation, so no self-join re-evaluation hazard — only
    # materialize when the caller asks (e.g. reusing ev across many
    # train partitions on a cluster).
    if materialize is not None and materialize is not False:
        ev = _materialize(ev, materialize)
    out = (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").cast("long").alias("n_shared_grams"),
            F.count_distinct("eval_id").cast("long").alias("n_eval_docs"),
        )
    )
    if min_shared > 1:
        out = out.filter(F.col("n_shared_grams") >= min_shared)
    return out


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_shared: int = 1,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """The train corpus minus contaminated documents (LEFT ANTI join
    against :func:`contamination_hits` ids) — schema-preserving, so it
    drops into a pipeline between dedup and shard planning."""
    hits = contamination_hits(
        train, eval_df, text_col, id_col, n, min_shared, max_gram_freq
    )
    return train.join(
        hits.select(F.col("doc_id").alias(id_col)), on=id_col, how="left_anti"
    )
