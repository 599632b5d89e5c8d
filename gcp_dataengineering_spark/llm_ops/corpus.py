"""Corpus-assembly operators: the steps between "filtered, deduped
documents" and "training shards" in a large-scale pipeline —
deterministic dataset splitting, token-budget shard planning, and
duplicate-keeper application.

All pure built-in-expression / window implementations (no UDFs, no
driver loops):

- `hash_split` is a *content-stable* split: membership depends only
  on the id hashed with a salt, so re-running over a grown corpus
  never moves an old document between train/val/test (the property
  that prevents eval contamination across dataset versions). One
  projection, runs at scan speed.
- `shard_by_token_budget` plans output shards of ~budget tokens by
  greedy sequential fill within each partition column value: an
  exclusive prefix sum (one window over (part, order)) divided by
  the budget. One shuffle on the partition column; the window and
  the subsequent per-shard aggregation reuse the same partitioning.
- `apply_dedup_keepers` joins the connected-component labels from
  `dedup.resolve_dup_groups` back to the corpus and keeps each
  group's canonical document — the final step of every near-dup
  pipeline. Broadcast-friendly when the label table is small;
  shuffle hash join on doc_id otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import md5_60bit, whitespace_token_count


# Bucket count shared by hash_bucket's default and hash_split's
# percent thresholds — a percent IS a bucket count only because this
# is 100, so both read the same constant (desynchronizing them would
# silently skew the split ratios).
SPLIT_BUCKETS = 100


def hash_bucket(
    id_col: Column | str, salt: str = "split", buckets: int = SPLIT_BUCKETS
) -> Column:
    """Deterministic bucket in [0, buckets): md5_60bit(salt || 0x1f
    || id) mod buckets (see text.md5_60bit for the DuckDB spelling)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_60bit(F.concat(F.lit(salt), F.lit("\x1f"), c.cast("string"))) % buckets


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column ('train' / 'val' / 'test') by
    deterministic hash bucket of the id. Content-stable: a document's
    split never changes as the corpus grows.

    train_pct + val_pct == 100 is allowed (deliberately empty test
    split); > 100 raises — it would silently mislabel val rows."""
    if train_pct < 0 or val_pct < 0 or train_pct + val_pct > 100:
        raise ValueError(
            f"invalid split percentages train={train_pct} val={val_pct}: "
            "need train_pct >= 0, val_pct >= 0, train_pct + val_pct <= 100"
        )
    b = hash_bucket(id_col, salt, SPLIT_BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def _with_straggler_bucket(
    df: DataFrame,
    parts: list[str],
    order_col: str,
    max_partition_rows: int,
    bucket_col: str = "_shard_bucket",
    salt: str = "shardbucket",
) -> DataFrame:
    """Injects a deterministic ``bucket_col`` bounding every window
    partition over ``parts + [bucket_col]`` to ~``max_partition_rows``
    rows: one cheap count per part value sizes a per-part bucket count
    ``ceil(rows / max_partition_rows)``; the bucket is a seeded hash of
    ``order_col`` mod that count. The sizing join broadcasts (part
    cardinality is low by premise) and is null-safe — a NULL part value
    (e.g. lang unset after a failed lang-ID) must not be silently
    dropped by the guard."""
    if max_partition_rows < 1:
        raise ValueError(
            f"max_partition_rows ({max_partition_rows}) must be >= 1"
        )
    sizes = (
        df.groupBy(*parts)
        .agg(F.count(F.lit(1)).alias("_part_rows"))
        .select(
            *[F.col(p).alias(f"_k{i}") for i, p in enumerate(parts)],
            F.greatest(
                F.ceil(F.col("_part_rows") / F.lit(max_partition_rows)),
                F.lit(1),
            )
            .cast("int")
            .alias("_n_buckets"),
        )
    )
    # eqNullSafe, not a bare equi-join on the names: a NULL part
    # value groups into a NULL row in `sizes`, and NULL == NULL is
    # never true — a plain join would silently drop every such
    # document. (The guardless path keeps them: Window.partitionBy
    # treats NULL as a partition value.)
    cond = F.lit(True)
    for i, p in enumerate(parts):
        cond = cond & F.col(p).eqNullSafe(F.col(f"_k{i}"))
    return (
        df.join(F.broadcast(sizes), cond)
        .drop(*[f"_k{i}" for i in range(len(parts))])
        .withColumn(
            bucket_col,
            (
                md5_60bit(
                    F.concat(
                        F.lit(salt + "\x1f"),
                        F.col(order_col).cast("string"),
                    )
                )
                % F.col("_n_buckets")
            ).cast("int"),
        )
        .drop("_n_buckets")
    )


def shard_by_token_budget(
    df: DataFrame,
    budget_tokens: int,
    part_col: str | list[str] = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    max_partition_rows: int | None = None,
) -> DataFrame:
    """Assigns each document a `shard_id` so consecutive documents
    (ordered by `order_col` within `part_col`) fill shards of
    ~`budget_tokens` whitespace tokens: shard_id = exclusive-prefix
    token sum ÷ budget. Deterministic, one window pass.

    Scale note: a greedy sequential fill is inherently ordered, so
    each `part_col` value is ONE window partition processed by one
    task. With a low-cardinality part_col (e.g. language alone) that
    is a straggler at 100 TB. Two escapes:

    - pass a composite like ``["lang", hash-bucket column]`` (see
      `hash_bucket`) yourself, or
    - set ``max_partition_rows``: the ENFORCED straggler guard. One
      cheap count per part value sizes a deterministic per-part
      bucket count ``ceil(rows / max_partition_rows)``; a
      ``_shard_bucket`` column (seeded hash of ``order_col`` mod
      that count) is injected into the window partitioning, bounding
      every window partition to ~max_partition_rows rows — a
      single-language 100 TB corpus fans out instead of serializing
      on one task. The sizing join broadcasts (part cardinality is
      low by premise).

    Either way shard ids stay unique per (part..., [_shard_bucket,]
    shard_id) tuple, which is what a sharded writer keys on anyway."""
    parts = [part_col] if isinstance(part_col, str) else list(part_col)
    if max_partition_rows is not None:
        df = _with_straggler_bucket(df, parts, order_col, max_partition_rows)
        parts = parts + ["_shard_bucket"]
    toks = whitespace_token_count(text_col).cast("long")
    w = Window.partitionBy(*parts).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    inclusive = F.sum(toks).over(w)
    return df.withColumn("n_tokens", toks).withColumn(
        "shard_id", F.floor((inclusive - toks) / F.lit(budget_tokens)).cast("long")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    part_col: str | list[str] = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    max_partition_rows: int | None = None,
) -> DataFrame:
    """Training-sequence packing plan: documents are concatenated in
    ``order_col`` order within each ``part_col`` value and the token
    stream is chopped into fixed ``seq_len`` windows — a document
    spanning a window boundary contributes one CHUNK row to each
    sequence it overlaps (what a pretraining loader does when packing
    samples into fixed context windows, boundary-agnostic variant).

    Output: one row per (document, sequence) chunk with
    ``seq_id``            — the fixed-length window index,
    ``seq_offset``        — where the chunk starts inside the window,
    ``doc_offset``        — where the chunk starts inside the doc,
    ``n_tokens_in_seq``   — the chunk length.
    Invariants: every window except each partition's last is exactly
    full; a document's chunks partition its tokens contiguously.

    Shape: one window prefix-sum per partition value, then a per-row
    sequence() explode of ≤ ceil(doc_tokens / seq_len) + 1 chunk
    descriptors — no shuffle after the window, scan-sized output.
    Zero-token documents yield no chunks.

    Scale note — ``max_partition_rows`` is the ENFORCED straggler
    guard (same mechanism as shard_by_token_budget's): a
    ``_pack_bucket`` column (deterministic hash of ``order_col``,
    sized per part value) is injected into the window partitioning,
    bounding every prefix-sum partition to ~max_partition_rows rows so
    a single-language 100 TB corpus fans out instead of serializing on
    one task. SEMANTICS CAVEAT: the guard changes WHICH documents are
    adjacent — each (part..., _pack_bucket) group packs its own token
    stream in ``order_col`` order, so there is one partial tail window
    PER BUCKET instead of per part value, and cross-bucket documents
    never share a sequence. The packing invariants (full windows
    except each stream's last; contiguous doc chunks) hold per bucket;
    seq ids are unique per (part..., _pack_bucket, seq_id), which is
    what a sharded loader keys on anyway. Leave unset when exact
    whole-partition adjacency matters more than the straggler bound.
    Bucket assignment is content-stable (seeded hash of order_col),
    never RNG."""
    if seq_len < 1:
        raise ValueError(f"seq_len ({seq_len}) must be >= 1")
    parts = [part_col] if isinstance(part_col, str) else list(part_col)
    if max_partition_rows is not None:
        df = _with_straggler_bucket(
            df, parts, order_col, max_partition_rows,
            bucket_col="_pack_bucket", salt="packbucket",
        )
        parts = parts + ["_pack_bucket"]
    toks = whitespace_token_count(text_col).cast("long")
    w = Window.partitionBy(*parts).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    end = F.sum(toks).over(w)
    based = df.withColumn("n_tokens", toks).withColumn("_end", end).withColumn(
        "_start", F.col("_end") - F.col("n_tokens")
    )
    first_seq = F.floor(F.col("_start") / F.lit(seq_len))
    last_seq = F.floor((F.col("_end") - 1) / F.lit(seq_len))
    chunks = based.filter(F.col("n_tokens") > 0).select(
        *parts,
        order_col,
        "_start",
        "_end",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    chunk_start = F.greatest(F.col("_start"), F.col("seq_id") * seq_len)
    chunk_end = F.least(F.col("_end"), (F.col("seq_id") + 1) * seq_len)
    return chunks.select(
        *parts,
        order_col,
        F.col("seq_id").cast("long").alias("seq_id"),
        (chunk_start - F.col("seq_id") * seq_len).cast("long").alias("seq_offset"),
        (chunk_start - F.col("_start")).cast("long").alias("doc_offset"),
        (chunk_end - chunk_start).cast("long").alias("n_tokens_in_seq"),
    )


def pack_sequences_no_split(
    df: DataFrame,
    seq_len: int,
    part_col: str | list[str] = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    max_partition_rows: int | None = None,
    overlong: str = "truncate",
) -> DataFrame:
    """BOUNDARY-RESPECTING packing plan — the other loader
    convention (cf. :func:`pack_sequences`, which splits documents
    across windows): documents are packed WHOLE, greedy first-fit in
    ``order_col`` order within each ``part_col`` value — a document
    that does not fit the current window's remaining space starts a
    new window; documents never span windows.

    Over-long documents (tokens > seq_len), per ``overlong``:
    - ``'truncate'``: clamped to ``seq_len`` (always alone-filling a
      window) and marked ``is_overlong`` — the loader drops the tail;
    - ``'flag'``: emitted at full length in a window of their own,
      marked ``is_overlong`` — every OTHER window obeys ≤ seq_len and
      the caller decides (re-chunk via pack_sequences, drop, …).

    Output: ONE row per non-empty document — (part…, order_col,
    n_tokens, seq_id, seq_offset, n_tokens_in_seq, is_overlong);
    ``seq_id`` is unique per part group, ``seq_offset`` is the doc's
    start inside its window. Zero-token documents yield no rows
    (matching pack_sequences).

    Scale shape: greedy fill is inherently SEQUENTIAL state — not a
    prefix-sum — so this is one of the few legitimate
    ``applyInPandas`` operators: tokens are counted JVM-side first
    and only (part…, order, n_tokens) rows — never text — cross into
    Arrow, so the Python stage streams a few longs per document. Each
    part value is one group; ``max_partition_rows`` injects the same
    enforced straggler bucket as pack_sequences (one greedy stream
    per bucket, content-stable hash of ``order_col``) so a
    single-language corpus fans out. Same caveat: bucketing changes
    adjacency — one partial tail window per bucket."""
    if seq_len < 1:
        raise ValueError(f"seq_len ({seq_len}) must be >= 1")
    if overlong not in ("truncate", "flag"):
        raise ValueError(f"overlong ({overlong!r}) must be 'truncate' or 'flag'")
    parts = [part_col] if isinstance(part_col, str) else list(part_col)
    if max_partition_rows is not None:
        df = _with_straggler_bucket(
            df, parts, order_col, max_partition_rows,
            bucket_col="_pack_bucket", salt="packbucket",
        )
        parts = parts + ["_pack_bucket"]
    toks = whitespace_token_count(text_col).cast("long")
    slim = df.select(*parts, order_col, toks.alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    out_fields = [slim.schema[c] for c in (*parts, order_col, "n_tokens")]
    schema = T.StructType(
        out_fields
        + [
            T.StructField("seq_id", T.LongType()),
            T.StructField("seq_offset", T.LongType()),
            T.StructField("n_tokens_in_seq", T.LongType()),
            T.StructField("is_overlong", T.BooleanType()),
        ]
    )
    truncate = overlong == "truncate"

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        seq_ids, offsets, lens, flags = [], [], [], []
        cur_seq, used = -1, 0  # no window open yet
        for n in pdf["n_tokens"]:
            over = n > seq_len
            t = min(n, seq_len) if truncate else n
            if over and not truncate:
                # full-length doc fills a fresh window of its own
                cur_seq += 1
                seq_ids.append(cur_seq)
                offsets.append(0)
                lens.append(t)
                flags.append(True)
                used = seq_len  # window closed: next doc opens a new one
                continue
            if cur_seq < 0 or used + t > seq_len:
                cur_seq += 1
                used = 0
            seq_ids.append(cur_seq)
            offsets.append(used)
            lens.append(t)
            flags.append(over)
            used += t
        return pd.DataFrame(
            {
                **{c: pdf[c] for c in (*parts, order_col, "n_tokens")},
                "seq_id": pd.Series(seq_ids, dtype="int64"),
                "seq_offset": pd.Series(offsets, dtype="int64"),
                "n_tokens_in_seq": pd.Series(lens, dtype="int64"),
                "is_overlong": pd.Series(flags, dtype="bool"),
            }
        )

    return slim.groupBy(*parts).applyInPandas(_pack, schema=schema)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float] | float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Content-stable stratified sampling: keep a row iff its seeded
    hash bucket (0-9999) falls under ``fraction × 10000`` for its
    stratum. ``fractions`` is either one float or a per-stratum-value
    dict (missing strata default to 0.0 — dropped).

    Unlike ``df.sample()``, membership is a pure function of
    (salt, id): re-running over a grown corpus never flips an old
    row's membership, samples are reproducible across engines
    (the bucket is the md5 arithmetic DuckDB replays exactly), and
    upstream/downstream order or partitioning cannot change the
    result. This is the sampling you can audit at 100 TB — a filter
    at scan speed, no shuffle, no RNG state."""
    b = hash_bucket(id_col, salt, buckets=10000)
    if isinstance(fractions, dict):
        for k, v in fractions.items():
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
        thresh = None
        for value, frac in fractions.items():
            cond = F.col(strata_col) == value
            expr = F.when(cond, F.lit(int(round(frac * 10000))))
            thresh = expr if thresh is None else thresh.when(cond, F.lit(int(round(frac * 10000))))
        thresh = thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    else:
        if not 0.0 <= fractions <= 1.0:
            raise ValueError(f"fraction must be in [0, 1], got {fractions}")
        thresh = F.lit(int(round(fractions * 10000)))
    return df.filter(b < thresh)


def shuffle_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 1024,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic training-order shuffle plan: adds
    ``shuffle_bucket`` (seeded hash of the id mod ``buckets``) and
    ``pos_in_bucket`` (dense row number within the bucket, ordered by
    a SECOND seeded hash with the id as tiebreak). Reading buckets in
    order, positions in order, yields a pseudo-random but fully
    reproducible global training order — what a data loader needs to
    shuffle a corpus without materializing a global sort.

    Scale shape: one shuffle on the bucket column, then ``buckets``
    independent window partitions of ~N/buckets rows each — size
    ``buckets`` so a partition fits an executor (there is no global
    window). Unlike hash_split, the ORDER is corpus-dependent
    (row numbers shift when documents are added); the BUCKET of a
    given id is content-stable. No RNG state — two engines replay the
    identical order (DuckDB: same md5 arithmetic + row_number)."""
    if buckets < 1:
        raise ValueError(f"buckets ({buckets}) must be >= 1")
    bucket = hash_bucket(id_col, salt, buckets)
    order = md5_60bit(
        F.concat(F.lit(salt + "-order\x1f"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shuffle_bucket").orderBy(order, F.col(id_col))
    return (
        df.withColumn("shuffle_bucket", bucket.cast("int"))
        .withColumn("pos_in_bucket", F.row_number().over(w).cast("long"))
    )


def mixture_fractions(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str = "lang",
    text_col: str = "text",
) -> dict[str, float]:
    """Per-domain keep fractions achieving a target TOKEN mixture
    (domain weighting, the 'data recipe' step): scale every domain to
    the largest feasible corpus with token shares proportional to
    ``targets`` — the binding domain (smallest tokens/target ratio)
    keeps fraction 1.0, every other domain downsamples to match.

    One aggregation over the corpus (#domains result rows — collected
    to the driver, contract-bounded like a broadcast dim); compose
    with `stratified_sample(df, fractions, domain_col)` to apply at
    scan speed. Domains absent from ``targets`` get fraction 0.0
    (dropped), as do zero-weight targets — even when the domain has
    no corpus rows. Raises on negative weights, and if a
    POSITIVE-weight domain has no tokens. Sibling of
    :func:`mixture_plan` (r11), which DERIVES weights from corpus
    sizes via the temperature rule (p_s ∝ n_s^alpha) and plans
    against a token budget instead of explicit targets."""
    if any(w < 0 for w in targets.values()):
        bad = sorted(d for d, w in targets.items() if w < 0)
        raise ValueError(f"negative target weights for domains: {bad}")
    total = sum(targets.values())
    if total <= 0:
        raise ValueError("targets must have positive total weight")
    toks = whitespace_token_count(text_col).cast("long")
    counts = {
        r["d"]: r["t"]
        for r in df.select(F.col(domain_col).alias("d"), toks.alias("t"))
        .groupBy("d")
        .agg(F.sum("t").alias("t"))
        .collect()
    }
    # only positive-weight domains must exist: a w=0 domain is dropped
    # (fraction 0.0) whether or not the corpus contains it
    missing = [d for d, w in targets.items() if w > 0 and not counts.get(d)]
    if missing:
        raise ValueError(f"targeted domains with no tokens: {missing}")
    # largest feasible scaled-corpus size: every domain d must supply
    # C * share_d tokens with keep_frac <= 1  =>  C = min tokens_d/share_d
    c_max = min(counts[d] / (w / total) for d, w in targets.items() if w > 0)
    return {
        d: min(1.0, (c_max * (w / total)) / counts[d]) if w > 0 else 0.0
        for d, w in targets.items()
    }


def apply_dedup_keepers(
    df: DataFrame, groups: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keeps one document per duplicate group: join the
    (doc_id, group_id) labels from `resolve_dup_groups` and retain
    rows where the document IS its group's canonical keeper.

    LEFT join + coalesce(group_id, doc_id): a document absent from
    the labels table (caller derived labels from pairs only, not the
    full id set) has no duplicates by construction and is its own
    keeper — an inner join would silently drop every such unique
    document from the corpus."""
    labeled = df.join(groups, on=id_col, how="left")
    effective = F.coalesce(F.col("group_id"), F.col(id_col))
    return labeled.filter(F.col(id_col) == effective).drop("group_id")


# sentence-final token: ends with . ! or ? optionally followed by a
# closing quote/bracket run (Java ∩ RE2 — no lookaround)
SENTENCE_END_RE = "[.!?][\"')\\]]*$"


def chunk_docs(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    respect_sentences: bool = False,
    sentence_tolerance: int | None = None,
) -> DataFrame:
    """Sliding-window RAG/retrieval chunking: whitespace tokens cut
    into windows of ``chunk_tokens`` with ``overlap_tokens`` carried
    between consecutive windows (stride = chunk - overlap). Returns
    one row per chunk: (id, chunk_id, start_tok, n_chunk_tokens,
    chunk_text).

    Window-count rule: ``greatest(1, ceil((n - overlap) / stride))``
    — every token is covered (the last window always reaches the end)
    and no window is fully contained in its predecessor (a start
    inside the final overlap would re-emit already-covered tokens).
    Empty/whitespace-only docs produce one empty chunk rather than
    disappearing (callers filter on n_chunk_tokens if they want
    drops to be explicit).

    ``respect_sentences`` (r12 — the published RAG-chunking default):
    each non-final window's END snaps back to the LAST sentence-final
    token (matches :data:`SENTENCE_END_RE`: '.', '!' or '?' plus an
    optional closing-quote run) within ``sentence_tolerance`` tokens
    of the nominal end; no boundary in the tolerance window → the
    nominal cut stands. Starts stay on the FIXED stride grid — that
    is what keeps the mode closed-form (no sequential chaining) and
    preserves the coverage invariant: tolerance is capped at
    ``overlap_tokens``, so a snapped end never retreats past the
    next window's start (snapped ≥ start + chunk − overlap = next
    start). chunk_id / start_tok are identical to the classic mode;
    only the cut tail differs. Default tolerance = overlap_tokens
    (the widest coverage-safe value); overlap 0 therefore cannot
    snap — raise the overlap or pass a tolerance explicitly (which
    still must be ≤ overlap, enforced).

    Scale shape: pure projection + explode — no shuffle, no UDF; the
    token array is built once per row and sliced per chunk
    (``slice``/``array_join`` are codegen'd; the sentence snap adds
    one O(tolerance) filtered-sequence probe per chunk). Output size
    is n_tokens × (1 + overlap/stride) per doc — the overlap tax is
    the only amplification, and it is bounded by the parameters, not
    the data."""
    if chunk_tokens <= overlap_tokens:
        raise ValueError(
            f"chunk_tokens ({chunk_tokens}) must exceed overlap_tokens "
            f"({overlap_tokens}): stride would be <= 0"
        )
    tol = 0
    if respect_sentences:
        tol = (
            overlap_tokens if sentence_tolerance is None else sentence_tolerance
        )
        if tol > overlap_tokens:
            raise ValueError(
                f"sentence_tolerance ({tol}) must be <= overlap_tokens "
                f"({overlap_tokens}): a deeper snap would uncover the "
                "tokens between the snapped end and the next window"
            )
        if tol < 0:
            raise ValueError(f"sentence_tolerance must be >= 0, got {tol}")
    stride = chunk_tokens - overlap_tokens
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda x: x != ""
    )
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).cast("bigint").alias("_n"),
    ).withColumn(
        "_n_chunks",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(f"(_n - {overlap_tokens} + {stride} - 1) div {stride}"),
        ),
    )
    exploded = base.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_n_chunks") - 1)).alias(
            "chunk_id"
        ),
    )
    start = F.col("chunk_id") * stride  # 0-based
    if tol > 0:
        n = F.size("_toks").cast("bigint")
        hi = F.least(start + chunk_tokens, n)  # 1-based inclusive end
        is_last = hi >= n
        # candidate offsets i ∈ [1, tol]: position p = hi - tol + i is
        # in-range and its token is sentence-final; take the LAST
        cand = F.filter(
            F.sequence(F.lit(1).cast("bigint"), F.lit(tol).cast("bigint")),
            lambda i: (hi - tol + i >= 1)
            & F.element_at(
                F.col("_toks"), (hi - F.lit(tol) + i).cast("int")
            ).rlike(SENTENCE_END_RE),
        )
        snapped = F.when(
            is_last | (F.size(cand) == 0), hi
        ).otherwise(hi - tol + F.array_max(cand))
        ctoks = F.slice(
            F.col("_toks"),
            (start + 1).cast("int"),
            (snapped - start).cast("int"),
        )
    else:
        ctoks = F.slice(
            F.col("_toks"), (start + 1).cast("int"), chunk_tokens
        )
    return exploded.select(
        id_col,
        "chunk_id",
        start.cast("bigint").alias("start_tok"),
        F.size(ctoks).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(ctoks, " ").alias("chunk_text"),
    )


def source_reputation_filter(
    df: DataFrame,
    pass_col: str,
    source_col: str = "source",
    min_pass_pct: int = 50,
    min_docs: int = 1,
) -> DataFrame:
    """Domain/source-level reputation gate (the RefinedWeb-style
    "judge the site, not just the page" filter): a source survives iff
    at least ``min_pass_pct`` percent of its documents pass the
    per-document quality policy (``pass_col``, a boolean the caller
    computed — e.g. the quality_filter thresholds) and it has at
    least ``min_docs`` documents. Returns the input rows from
    surviving sources (all of them — page-level filtering is a
    separate, composable step).

    The keep decision is exact integer arithmetic
    (``n_pass * 100 >= min_pass_pct * n_docs``) — no float ratio, so
    the verdict is reproducible bit-for-bit in any engine.

    Scale shape: the reputation table is one row per source — a
    map-side-combined aggregation whose shuffle is #sources rows,
    then a broadcast LEFT SEMI join back; the corpus itself is never
    shuffled."""
    rep = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_docs"),
        F.sum(F.col(pass_col).cast("bigint")).alias("_n_pass"),
    )
    keep = rep.filter(
        (F.col("_n_pass") * 100 >= F.lit(min_pass_pct) * F.col("_n_docs"))
        & (F.col("_n_docs") >= min_docs)
    ).select(F.col(source_col).alias("_keep_src"))
    # eqNullSafe: a NULL source is a legitimate group (groupBy put it
    # in one) — an equality semi-join would silently drop every
    # NULL-source row regardless of the group's verdict
    return df.join(
        F.broadcast(keep), F.col(source_col).eqNullSafe(F.col("_keep_src")), "left_semi"
    )


def approx_distinct_stats(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group cardinality at sketch cost: (group..., n_rows,
    approx_distinct) via HyperLogLog++ (approx_count_distinct).

    The scale rationale: exact countDistinct physically expands to a
    two-phase distinct (every distinct VALUE crosses the wire before
    the count); the HLL sketch is a few KB per group, merged
    map-side, so the shuffle is #groups × sketch-size no matter how
    many distinct values exist. At 100 TB corpus fingerprint counts,
    exact is a full-table shuffle, the sketch is a rounding error —
    and dedup-rate dashboards tolerate ±2% by construction. The
    exact twin (suite q_dedup_stats) stays the oracle-gated truth;
    this is the monitoring path. Plan + accuracy receipts:
    tests/test_scale_ops.py::test_approx_distinct_stats."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.approx_count_distinct(col, rsd).cast("bigint").alias("approx_distinct"),
    )


def cap_source_tokens(
    df: DataFrame,
    max_tokens: int,
    source_col: str = "source",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Per-source token-budget cap (anti-overrepresentation: no
    domain may contribute more than ``max_tokens`` to the corpus).
    Deterministic greedy prefix: docs taken in ``order_col`` order
    until the source's cumulative tokens would exceed the cap — an
    INCLUSIVE prefix sum compare (the doc that crosses the cap is
    dropped, everything before it kept), so membership is stable
    under corpus growth *within* the kept prefix.

    One window over (source / order) — a single shuffle on source,
    same partitioning the downstream per-source aggregation reuses.
    Skewed giant sources cost one window pass, not a collect."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("_cum_tokens", cum)
        .filter(F.col("_cum_tokens") <= max_tokens)
        .drop("_cum_tokens")
    )


def mixture_plan(
    df: DataFrame,
    alpha: float = 0.5,
    budget_tokens: int | None = None,
    source_col: str = "source",
    token_col: str = "n_tokens",
    exact_budget: bool = False,
) -> DataFrame:
    """Temperature-weighted source-mixing plan (r11): the published
    multilingual sampling rule (exponentiated-weight mixing, p_s ∝
    n_s^alpha — the mBERT/XLM-R recipe) as one aggregation. Per
    source: its token count, its alpha-weighted mixture ``weight``,
    and — when ``budget_tokens`` is given — the ``target_tokens``
    allocation, the deterministic downsampling ``sample_rate``
    (min(1, target/n) — a plan never mints data) and ``epochs``
    (target/n; upsampling shows as epochs > 1 for the training loop
    to repeat, never as duplicated rows). alpha=1 reproduces natural
    proportions, alpha=0 is uniform; in between damps the
    head-domain dominance a raw crawl mixture has.

    Sibling of :func:`mixture_fractions` (r6), which takes
    CALLER-SUPPLIED explicit target weights and returns the
    largest-feasible driver-side fraction dict; this one DERIVES the
    weights from corpus sizes by the temperature rule and keeps the
    plan as a DataFrame (budget targets, rates, epochs) for
    :func:`apply_mixture` / the pipeline stage.

    Ratios are ROUNDED to 6 dp so the frame is engine-replayable
    bit-for-bit (the external oracle hashes values). Budget drift
    (ADVICE r11): with the default ``exact_budget=False`` each
    source's ``target_tokens`` is independently rounded from the
    6-dp weight, so ``sum(target_tokens)`` ≈ ``budget_tokens`` only
    within rounding — off by up to ~``budget × 5e-7 × n_sources``
    plus one token per source. ``exact_budget=True`` makes the sum
    EXACTLY ``budget_tokens``: floor allocation + largest-remainder
    for the fractional deficit (ties broken by source name asc), and
    any residual from the 6-dp weight rounding itself spread evenly
    by div/mod over the remainder ranking — all integer arithmetic,
    deterministic in both engines. (Exactness assumes
    ``budget_tokens`` ≳ ``n_sources``; a pathological tiny budget
    clamps at 0 per source and is documented as such.)

    Scale shape:
    one source-keyed aggregation; the weight normalization is an
    unpartitioned window over the AGGREGATED frame — #sources rows
    (dimension-sized by construction), never the corpus."""
    if alpha < 0:
        raise ValueError(f"alpha ({alpha}) must be >= 0")
    per_src = df.groupBy(source_col).agg(
        F.sum(F.col(token_col)).cast("long").alias("n_tokens")
    )
    # alpha=0.5 (the published default) is spelled sqrt, NOT
    # pow(x, 0.5): IEEE-754 sqrt is correctly rounded and therefore
    # bit-identical across engines (the external oracle replays it),
    # while pow's libm implementations may differ in the last ulp
    n = F.col("n_tokens").cast("double")
    pw = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    tot = Window.partitionBy()
    out = per_src.withColumn("_pw", pw).withColumn(
        "weight", F.round(F.col("_pw") / F.sum("_pw").over(tot), 6)
    )
    if budget_tokens is not None:
        raw = F.lit(float(budget_tokens)) * F.col("weight")
        if exact_budget:
            # floor + largest-remainder (deterministic tie-break by
            # source name), then the residual the 6-dp weight
            # rounding leaves (which can exceed the row count at
            # large budgets) spread evenly by div/mod over the same
            # ranking — sum(target_tokens) == budget_tokens exactly
            wall = Window.partitionBy()
            wrk = Window.orderBy(
                (raw - F.floor(raw)).desc(), F.col(source_col).asc()
            )
            fl = F.floor(raw).cast("long")
            deficit = F.lit(int(budget_tokens)) - F.sum(fl).over(wall)
            nsrc = F.count(F.lit(1)).over(wall)
            extra = F.pmod(deficit, nsrc)
            # integer `div`, not float `/` (r12 ADVICE): keeps the
            # exact-sum guarantee all-integer end-to-end — (deficit −
            # pmod(deficit, n)) is divisible by n, so IntegralDivide
            # is exact for any BIGINT budget, while a double
            # intermediate is only exact while it stays within 2^53
            base = F.call_function("div", deficit - extra, nsrc)
            rk = F.row_number().over(wrk)
            target = F.greatest(
                F.lit(0).cast("long"),
                (
                    fl
                    + base.cast("long")
                    + F.when(rk <= extra, F.lit(1)).otherwise(F.lit(0))
                ),
            )
        else:
            target = F.round(raw).cast("long")
        out = (
            out.withColumn("target_tokens", target)
            .withColumn(
                "sample_rate",
                F.round(
                    F.least(
                        F.lit(1.0),
                        F.col("target_tokens") / F.col("n_tokens"),
                    ),
                    6,
                ),
            )
            .withColumn(
                "epochs",
                F.round(F.col("target_tokens") / F.col("n_tokens"), 6),
            )
        )
    return out.drop("_pw")


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixture",
    on_missing: str = "drop",
) -> DataFrame:
    """Apply a :func:`mixture_plan`'s downsampling side: keep a row
    iff its seeded hash bucket (0-999999) falls under its source's
    ``sample_rate`` × 10⁶ — the same content-stable, RNG-free,
    engine-replayable membership rule as :func:`stratified_sample`
    (a grown corpus never flips an old row). Sources with
    sample_rate 1 (epochs >= 1) keep every row — upsampling is the
    training loop's job, per the plan's ``epochs`` column. One
    broadcast join of the dimension-sized plan + a scan-speed
    filter; no shuffle of the corpus.

    Unknown-source contract (``on_missing``, r12 — the r11 verdict's
    silent-drop finding): a row whose source is ABSENT from the plan
    has no sample_rate. On the pipeline path this cannot happen (the
    plan is computed from the same frame), but a direct caller
    replaying a STALE plan against a grown corpus can hit it:

    - ``"drop"`` (default, the historical behavior, now explicit):
      unknown sources are excluded — a stale plan never smuggles an
      unbudgeted source into the mix;
    - ``"keep"``: unknown sources pass through unsampled (treat the
      plan as covering only the sources it names);
    - ``"error"``: raise ``ValueError`` naming an offending source —
      one broadcast left-anti probe stopped at the first hit (no
      corpus shuffle, no full count)."""
    if on_missing not in ("drop", "keep", "error"):
        raise ValueError(
            f"on_missing must be 'drop', 'keep' or 'error', got {on_missing!r}"
        )
    b = hash_bucket(id_col, salt, buckets=1_000_000)
    rates = plan.select(
        F.col(source_col).alias("_mx_src"),
        F.round(F.col("sample_rate") * 1_000_000).cast("long").alias("_mx_keep"),
    )
    if on_missing == "error":
        missing = (
            df.join(
                F.broadcast(rates.select("_mx_src")),
                F.col(source_col) == F.col("_mx_src"),
                "left_anti",
            )
            .select(F.col(source_col))
            .limit(1)
            .collect()
        )
        if missing:
            raise ValueError(
                f"apply_mixture: source {missing[0][0]!r} is absent from "
                "the mixture plan (stale plan vs grown corpus?); pass "
                "on_missing='drop' or 'keep' to resolve explicitly"
            )
    keep_missing = F.lit(1_000_000) if on_missing == "keep" else F.lit(0)
    return (
        df.join(
            F.broadcast(rates), F.col(source_col) == F.col("_mx_src"), "left"
        )
        .filter(b < F.coalesce(F.col("_mx_keep"), keep_missing))
        .drop("_mx_src", "_mx_keep")
    )


def keep_top_fraction_by_score(
    df: DataFrame,
    score_col: str,
    keep_pct: int,
    min_score: int | None = None,
) -> DataFrame:
    """Adaptive quality gate: keep (at least) the top ``keep_pct``
    percent of rows by an INTEGER score, threshold derived from the
    data — the "keep the best 30% of the crawl" policy where the
    cutoff must float with the corpus, not be hand-tuned.

    Exact and engine-replayable (no approx_percentile, no floats):
    build the score histogram (one aggregation — shuffle is
    #distinct-scores rows), take the descending cumulative count, and
    pick the LARGEST score t with cum(>= t) >= ceil(n * keep_pct /
    100) — integer arithmetic throughout. Rows with score >= t are
    kept; ties at the threshold keep everything tied (so the kept
    fraction can exceed keep_pct — deterministic, never a random
    tie-break).

    Scale note: the cumulative step is a window over the HISTOGRAM
    (#distinct integer scores — token counts, hit counts: thousands),
    not the corpus, so its single-partition sort is bounded by the
    score domain. The corpus itself is scanned once and filtered
    against a 1-row broadcast threshold.

    ``min_score`` optionally floors the threshold (policy minimum
    even when the corpus is bad enough that the quantile dips
    lower)."""
    if not (0 < keep_pct <= 100):
        raise ValueError(f"keep_pct must be in (0, 100], got {keep_pct}")
    hist = df.groupBy(score_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w = (
        Window.orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_total", F.sum("_cnt").over(Window.partitionBy())
    )
    # target = ceil(total * keep_pct / 100), all BIGINT
    target = F.expr(f"(_total * {keep_pct} + 99) div 100")
    thresh = (
        cum.filter(F.col("_cum") >= target)
        .agg(F.max(score_col).alias("_threshold"))
    )
    if min_score is not None:
        thresh = thresh.select(
            F.greatest(F.col("_threshold"), F.lit(min_score)).alias("_threshold")
        )
    return (
        df.crossJoin(F.broadcast(thresh))
        .filter(F.col(score_col) >= F.col("_threshold"))
        .drop("_threshold")
    )


def sample_k_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "samplek",
) -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by seeded
    content hash — the deterministic, RNG-free cousin of per-group
    reservoir sampling (inspection sets, eval slices, "give me 100
    docs per domain"). Membership depends only on (salt, id, the
    group's other members' hashes), so re-runs reproduce the sample
    bit-for-bit; unlike the fraction-based stratified_sample the
    count contract is exact.

    One window over (group / hash, id): a single shuffle on the
    group column; rank ≤ k. The hash orders rows uniformly within
    the group, the id tiebreak makes the order total."""
    h = hash_bucket(F.col(id_col), salt=salt, buckets=2**60)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: one row per doc id
    present in either, with status 'added' / 'removed' / 'changed' /
    'unchanged' (changed = same id, different content fingerprint).
    The governance step between corpus releases — what moved, and
    how much, before retraining on it.

    Both sides reduce to (id, fp) BEFORE the full outer join, so the
    only thing shuffled is ids + 32-byte md5 fingerprints — never
    text. Aggregate downstream as needed
    (``.groupBy("status").count()`` is the release report)."""
    from .text import fingerprint

    # presence is tracked with explicit marker columns, NOT by fp
    # nullability: fingerprint(NULL text) is NULL, and conflating
    # "absent from this side" with "present with NULL text" would
    # mislabel NULL-text docs (an anticipated input — chunk_docs /
    # tokens_to_ids both coalesce it)
    o = old.select(
        F.col(id_col).alias("_id"),
        fingerprint(text_col).alias("_fp_old"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        fingerprint(text_col).alias("_fp_new"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(~F.col("_fp_old").eqNullSafe(F.col("_fp_new")), "changed")
        .otherwise("unchanged")
    )
    return joined.select(F.col("_id").alias(id_col), status.alias("status"))


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_doc_frac: float = 0.05,
    min_docs: int = 2,
    out_col: str | None = None,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet/RefinedWeb
    dedup-at-paragraph-granularity step): a SEGMENT (``sep``-split
    line/paragraph) that appears in AT LEAST ``ceil(total *
    max_doc_frac)`` documents (and at least ``min_docs``) is
    navigation/footer chrome, not content — strip it from every document and reassemble
    the rest in original order. Documents reduced to nothing come
    back as empty strings, not dropped (the caller's length filter
    owns that policy).

    Scale shape (3 bounded shuffles, no UDF):

    - explode segments with position, group by the segment's md5
      (32-byte shuffle key, never long text) counting DISTINCT
      documents — one exchange;
    - the frequent set is tiny BY CONSTRUCTION (each member occupies
      >= max_doc_frac of the corpus, so there are at most
      1/max_doc_frac of them) → broadcast LEFT ANTI join; the corpus
      re-enters without shuffling;
    - reassembly is one groupBy(id) collecting (pos, segment) structs
      — bounded per document by its own segment count, the same
      per-key bound every sessionizer carries.

    The corpus total used for the threshold is a 1-row broadcast
    (same pattern as keep_top_fraction_by_score), not a collect.
    """
    import re as _re

    if not sep:
        raise ValueError("sep must be a non-empty delimiter")
    if not (0.0 < max_doc_frac <= 1.0):
        raise ValueError(f"max_doc_frac ({max_doc_frac}) must be in (0, 1]")
    if min_docs < 1:
        raise ValueError(f"min_docs ({min_docs}) must be >= 1")
    reserved = {"_bp_id", "_bp_pos", "_bp_seg", "_bp_h", "_bp_nd", "_bp_total", "_bp_clean"}
    hit = set(df.columns) & reserved
    if hit:
        raise ValueError(
            f"input columns collide with remove_boilerplate internals: {sorted(hit)}"
        )
    out_col = out_col or text_col

    # F.split takes a REGEX while array_join rejoins literally — the
    # separator is escaped so both sides agree for metacharacter
    # separators like '|' or '.'
    sep_pattern = _re.escape(sep)
    segs = df.select(
        F.col(id_col).alias("_bp_id"),
        F.posexplode(F.split(F.col(text_col), F.lit(sep_pattern), -1)).alias(
            "_bp_pos", "_bp_seg"
        ),
    )
    total = df.select(
        F.count(F.lit(1)).cast("long").alias("_bp_total")
    )
    freq = (
        segs.filter(F.trim("_bp_seg") != "")
        .groupBy(F.md5(F.col("_bp_seg").cast("binary")).alias("_bp_h"))
        .agg(F.count_distinct("_bp_id").alias("_bp_nd"))
    )
    frequent = (
        freq.crossJoin(F.broadcast(total))
        .filter(
            (F.col("_bp_nd") >= F.lit(int(min_docs)))
            & (
                F.col("_bp_nd")
                >= F.ceil(F.col("_bp_total") * F.lit(float(max_doc_frac)))
            )
        )
        .select("_bp_h")
    )
    kept = segs.join(
        F.broadcast(frequent),
        F.md5(F.col("_bp_seg").cast("binary")) == F.col("_bp_h"),
        "left_anti",
    )
    rebuilt = kept.groupBy("_bp_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_bp_pos", "_bp_seg"))
                ),
                lambda s: s["_bp_seg"],
            ),
            sep,
        ).alias("_bp_clean")
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_bp_id"], "left")
        .withColumn(out_col, F.coalesce(F.col("_bp_clean"), F.lit("")))
        .drop("_bp_id", "_bp_clean")
    )
