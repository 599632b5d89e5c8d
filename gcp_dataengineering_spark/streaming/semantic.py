"""Streaming semantic dedup (r14 — the r13 verdict's item 2): the
SemDeDup-style gate of ``llm_ops.embed`` run ONLINE, so a near-line
corpus builder drops re-phrasings at ingest time instead of waiting
for the next batch rebuild.

Structured Streaming's built-in stateful operators can't express
this stage: semantic dedup needs PAIRWISE integer-cosine decisions
against previously seen documents, co-located by LSH bucket, plus a
per-document combine across L independent tables — a chain of two
stateful shapes the engine won't compose in one query. So the
operator follows this repo's other mutable-state streaming sink
(streaming/upsert.py) and runs as ``foreachBatch``: each micro-batch
is a small BATCH DataFrame, decided against an explicit on-disk
bucket store with exactly the batch module's machinery —

1. embed the batch in-engine (``embed.doc_embed_table`` — the same
   integer char-n-gram + sign-random-projection vectors the batch
   twin produces, bit-for-bit);
2. bucket with the SAME seeded gaussian sign-LSH tables
   (``similarity.with_gaussian_buckets``, quantize=False);
3. cross-batch candidates: equi-join the batch's (tbl, bucket) rows
   against the store's — never all-pairs — then the integer-exact
   cosine threshold (``cos² test in int64``, the batch twin's rule);
4. within-batch candidates: the batch's own (tbl, bucket) self-join
   + the same threshold, resolved to connected components
   (``dedup.resolve_dup_groups``, pointer-doubling);
5. admit each un-anchored component's min-id keeper (a component any
   member of which matched an earlier stored doc is ANCHORED — the
   whole component is a re-phrasing of something already admitted
   and is dropped);
6. append ALL seen nonzero-vector batch docs (admitted or not) to
   the store and evict rows older than the event-time watermark —
   state is O(docs per watermark window), the
   ``dropDuplicatesWithinWatermark`` bound, not O(corpus).

Zero-vector documents (no ASCII-alphanumeric content) carry no
semantic evidence: they are admitted unconditionally and never
stored — the batch twin's rule, which also keeps the one
pathological empty-doc hot bucket out of the store.

SEMANTICS vs the batch twin (``embed.semantic_dedup``): within one
micro-batch the resolution IS the batch twin (CC, min-id keeper) —
a single-batch replay matches it row-for-row. Across batches the
operator is GREEDY FIRST-ARRIVAL: a doc is dropped iff its component
reaches any EARLIER-SEEN doc. Storing dropped docs too (step 6) makes
the reachable set the full seen pair graph, so the two forms agree
whenever duplicate clusters are mutually similar (near-cliques — the
paraphrase-cluster shape real corpora produce) and arrivals respect
id order; a CHAIN component whose links arrive in separate batches
can retain one extra early member per chain break, and a cluster
whose min id arrives late keeps the earliest arrival instead. The
batch rebuild remains the authority; the stream/batch parity pytest
pins the clique + id-ordered case exactly.

Store layout & crash safety (the upsert sink's two-rename protocol):
``<store>/docs`` (one row per doc: id, vec, n2, event_epoch) and
``<store>/buckets`` (ids-only ×L explode — vectors never ride the
explode, the round-3 lesson), each swapped atomically per batch;
``_semantic_store_meta.json`` carries the monotonic event-time high
water mark. foreachBatch is at-least-once: the sink callback runs
BEFORE the store update, so a replayed batch can duplicate admitted
rows downstream but never lose them (and once the store holds the
batch's docs, a replay self-matches and admits nothing new — the
store doubles as the dedup ledger).

At 100 TB/day the local two-rename swap becomes the bucketed
manifest layout of streaming/upsert.py (or a Delta/Iceberg MERGE);
the decision plan — bucket equi-joins + integer cosine — is
unchanged, which is the point of sharing the batch machinery.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm_ops.dedup import resolve_dup_groups
from ..llm_ops.embed import (
    EMBED_SALT,
    doc_embed_table,
    int_cosine_pairs_guard,
)
from ..llm_ops.materialize import materialize as _materialize
from ..llm_ops.similarity import gaussian_planes_q, with_gaussian_buckets

__all__ = [
    "parse_watermark_seconds",
    "read_semantic_store",
    "semantic_dedup_batch",
    "semantic_dedup_stream",
]

_META_FILE = "_semantic_store_meta.json"
_UNITS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def parse_watermark_seconds(watermark: str) -> int:
    """'10 minutes' → 600; the CalendarInterval subset Structured
    Streaming watermarks actually use (single value + unit)."""
    m = re.fullmatch(r"\s*(\d+)\s*([a-z]+)\s*", watermark.lower())
    if not m or m.group(2) not in _UNITS:
        raise ValueError(
            f"unparseable watermark {watermark!r}; use '<n> "
            f"{'/'.join(sorted(set(_UNITS)))}'"
        )
    return int(m.group(1)) * _UNITS[m.group(2)]


def _read_meta(store_dir: str) -> dict:
    p = os.path.join(store_dir, _META_FILE)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {}


def _write_meta(store_dir: str, meta: dict) -> None:
    tmp = os.path.join(store_dir, _META_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(store_dir, _META_FILE))


def _swap_in(part_dir: str, write_df: DataFrame) -> None:
    """upsert_batch_into_snapshot's two-rename atomic replace, for
    one store table: write tmp → rename current to old → rename tmp
    in → drop old. Crash at any point leaves a readable state (a
    leftover old with the live dir missing IS the state — roll it
    back before merging against nothing)."""
    tmp, old = part_dir + "._tmp", part_dir + "._old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if os.path.exists(part_dir):
            shutil.rmtree(old)
        else:
            os.rename(old, part_dir)
    write_df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(part_dir):
        os.rename(part_dir, old)
    os.rename(tmp, part_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def read_semantic_store(
    spark, store_dir: str
) -> tuple[DataFrame | None, DataFrame | None, dict]:
    """(docs, buckets, meta) — None frames when the store is empty.
    docs: (_sid, _sv array<bigint>, _sn2, _sepoch); buckets:
    (_sid, tbl, bucket)."""
    meta = _read_meta(store_dir)
    docs_dir = os.path.join(store_dir, "docs")
    buckets_dir = os.path.join(store_dir, "buckets")
    if not (os.path.isdir(docs_dir) and os.path.isdir(buckets_dir)):
        return None, None, meta
    return (
        spark.read.parquet(docs_dir),
        spark.read.parquet(buckets_dir),
        meta,
    )


def semantic_dedup_batch(
    batch: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    ngram: int = 3,
    max_chars: int = 256,
    salt: str = EMBED_SALT,
    cos_num: int = 92,
    cos_den: int = 100,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 7,
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
    sink=None,
) -> DataFrame:
    """One micro-batch through the semantic gate (see module
    docstring for the full decision procedure). Returns the ADMITTED
    rows (original batch columns), already materialized — the store
    swap below would otherwise pull the files out from under the
    lazy plan. ``sink`` (admitted → None) runs BEFORE the store
    update, the at-least-once publish order.

    Without ``event_time_col`` the store is exact and grows with
    distinct seen docs (the ``dedup_stream_against_corpus``
    unbounded mode); with it, store rows older than the event-time
    high water mark minus ``watermark`` are evicted each batch
    (rows with a NULL event time are evicted on the next batch —
    they carry no time evidence to hold state open for)."""
    int_cosine_pairs_guard(dim, max(max_chars - ngram + 1, 1), cos_den)
    spark = batch.sparkSession
    if batch.isEmpty():
        return batch.limit(0)

    # 1-2. embed + squared norm, bucket the nonzero vectors
    emb = doc_embed_table(
        batch.select(F.col(id_col), F.col(text_col)),
        id_col, text_col, "_eq", dim, ngram, salt, max_chars,
    ).withColumn(
        "_n2",
        F.aggregate(
            F.col("_eq"), F.lit(0).cast("long"), lambda a, x: a + x * x
        ),
    )
    # the embedded batch feeds bucketing, both pair joins, and the
    # store append — pin it once (the measured Catalyst-inlines-the-
    # aggregate trap from the batch twin)
    nonzero = _materialize(emb.filter(F.col("_n2") > 0), None)
    flat = gaussian_planes_q(n_tables * n_planes, dim, seed)
    tables = [flat[t * n_planes:(t + 1) * n_planes] for t in range(n_tables)]
    bx = _materialize(
        with_gaussian_buckets(nonzero, tables, "_id", id_col, "_eq", quantize=False),
        None,
    )

    va = nonzero.select(
        F.col(id_col).alias("id_a"), F.col("_eq").alias("_va"),
        F.col("_n2").alias("_na2"),
    )
    vb = nonzero.select(
        F.col(id_col).alias("id_b"), F.col("_eq").alias("_vb"),
        F.col("_n2").alias("_nb2"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    thresh = (F.col("_dot") > 0) & (
        F.col("_dot") * F.col("_dot") * F.lit(cos_den * cos_den)
        >= F.lit(cos_num * cos_num) * F.col("_na2") * F.col("_nb2")
    )

    # 3. cross-batch: batch buckets ⋈ store buckets (ids-only), then
    # vectors re-joined AFTER candidate dedup
    store_docs, store_buckets, meta = read_semantic_store(spark, store_dir)
    if store_docs is not None:
        cross = (
            bx.select(F.col("_id").alias("id_a"), "tbl", "bucket")
            .join(store_buckets.select("_sid", "tbl", "bucket"), ["tbl", "bucket"])
            .select("id_a", "_sid")
            .distinct()
        )
        matched = (
            cross.join(va, "id_a")
            .join(
                store_docs.select(
                    "_sid", F.col("_sv").alias("_vb"), F.col("_sn2").alias("_nb2")
                ),
                "_sid",
            )
            .withColumn("_dot", idot)
            .filter(thresh)
            .select(F.col("id_a").alias(id_col))
            .distinct()
        )
    else:
        matched = nonzero.select(F.col(id_col)).limit(0)

    # 4. within-batch pairs → connected components over ALL batch ids
    # (zero-vector docs pair with nothing → their own keepers)
    pairs = (
        bx.select(F.col("_id").alias("id_a"), "tbl", "bucket")
        .join(bx.select(F.col("_id").alias("id_b"), "tbl", "bucket"), ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_dot", idot)
        .filter(thresh)
        .select("id_a", "id_b")
    )
    groups = resolve_dup_groups(
        batch.select(F.col(id_col)), pairs, id_col=id_col, materialize=None
    )

    # 5. drop anchored components whole; admit min-id keepers of the rest
    anchored = (
        groups.join(matched, id_col, "left_semi").select("group_id").distinct()
    )
    keeper_ids = (
        groups.filter(F.col(id_col) == F.col("group_id"))
        .join(anchored, "group_id", "left_anti")
        .select(F.col(id_col))
    )
    admitted = _materialize(batch.join(keeper_ids, id_col, "left_semi"), None)
    if sink is not None:
        sink(admitted)

    # 6. store append + watermark eviction (ALL seen nonzero docs —
    # dropped docs stay reachable, see the module's semantics note)
    epoch = (
        F.col(event_time_col).cast("timestamp").cast("double")
        if event_time_col is not None
        else F.lit(None).cast("double")
    )
    new_docs = nonzero.join(
        batch.select(F.col(id_col), epoch.alias("_sepoch")), id_col
    ).select(
        F.col(id_col).alias("_sid"), F.col("_eq").alias("_sv"),
        F.col("_n2").alias("_sn2"), "_sepoch",
    )
    new_buckets = bx.select(F.col("_id").alias("_sid"), "tbl", "bucket")
    all_docs = (
        store_docs.unionByName(new_docs) if store_docs is not None else new_docs
    )
    all_buckets = (
        store_buckets.unionByName(new_buckets)
        if store_buckets is not None
        else new_buckets
    )
    new_meta = dict(meta)
    if event_time_col is not None:
        batch_max = batch.agg(F.max(epoch)).collect()[0][0]
        hwm = max(
            x for x in (meta.get("max_event_epoch"), batch_max, float("-inf"))
            if x is not None
        )
        if hwm > float("-inf"):
            new_meta["max_event_epoch"] = hwm
            cutoff = hwm - parse_watermark_seconds(watermark)
            all_docs = all_docs.filter(F.col("_sepoch") >= F.lit(cutoff))
            all_buckets = all_buckets.join(
                all_docs.select("_sid"), "_sid", "left_semi"
            )
    # pin both tables before the swap rewrites the files they read
    all_docs = _materialize(all_docs, None)
    all_buckets = _materialize(all_buckets, None)
    os.makedirs(store_dir, exist_ok=True)
    _swap_in(os.path.join(store_dir, "docs"), all_docs)
    _swap_in(os.path.join(store_dir, "buckets"), all_buckets)
    _write_meta(store_dir, new_meta)
    return admitted


def semantic_dedup_stream(
    stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    **kwargs,
):
    """Wire a document stream through the semantic gate: admitted
    rows append to ``out_dir`` (parquet), state lives in
    ``store_dir``. Returns the started StreamingQuery (caller
    stops it). Keyword args are :func:`semantic_dedup_batch`'s."""

    def _process(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        semantic_dedup_batch(
            batch,
            store_dir,
            sink=lambda admitted: admitted.write.mode("append").parquet(out_dir),
            **kwargs,
        )

    writer = stream.writeStream.foreachBatch(_process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
