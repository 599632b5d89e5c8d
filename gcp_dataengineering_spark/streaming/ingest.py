"""Streaming document ingest: the composed online half of the corpus
pipeline (beyond-reference). A raw document stream passes, in order:

1. quality features + the corpus gate policy (stateless projections
   — identical expressions to the batch llm_ops.text forms, so the
   stream and a batch replay of the same rows agree row-for-row);
2. PII scrubbing (stateless regex projection);
3. language tagging (stateless);
4. exact dedup against the static corpus fingerprint table plus
   intra-stream dedup (streaming/dedup.dedup_stream_against_corpus —
   the only stateful stage, watermark-bounded when an event-time
   column exists).

Every stage is a per-row transformation except the final dedup, so
the whole flow runs under Structured Streaming with no custom state
beyond the dedup store — the design point: keep ingest stateless as
long as possible, concentrate state in one watermark-bounded spot.

5. (r14, optional) SemDeDup-style SEMANTIC dedup —
   :func:`ingest_stream_semantic` appends the streaming semantic
   gate (streaming/semantic.py: in-engine embeddings, LSH-bucketed
   watermark-bounded state, integer-exact cosine) after the exact
   dedup, completing the batch pipeline's stage order (2c→3→4→5a)
   online. It runs as a foreachBatch sink, so that composition
   returns a running query instead of a DataFrame.

The default gate mirrors the batch quality_filter policy
(suite/llm.py) so a document admitted online is the same document a
batch rebuild would admit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from typing import TYPE_CHECKING

from ..llm_ops.text import corpus_quality_gate, lang_id, quality_features, scrub_pii
from .dedup import dedup_stream_against_corpus

if TYPE_CHECKING:  # annotation only — the class lives in the sink
    from pyspark.sql.streaming import StreamingQuery


def default_quality_gate() -> Column:
    """The batch corpus gate — the SAME expression object the batch
    pipeline uses (llm_ops.text.corpus_quality_gate), re-exported
    under the streaming name: the stream/batch admission parity the
    module docstring promises is held by a shared definition, not by
    keeping two copies in sync."""
    return corpus_quality_gate()


def ingest_stream(
    stream: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    gate: Column | None = None,
    gopher: bool = False,
    gopher_min_words: int = 50,
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
    quality_model: DataFrame | None = None,
    quality_model_threshold: int = 0,
    quality_model_ngrams: int | str = 1,
    dsir_model: DataFrame | None = None,
    dsir_min_key: int | None = None,
    dsir_gumbel: bool = True,
    dsir_key_shift: int | None = None,
    dsir_ngrams: int | str = 2,
    dsir_id_col: str = "doc_id",
) -> DataFrame:
    """Quality-gated, PII-scrubbed, language-tagged, corpus-deduped
    document stream. Returns the admitted rows with `lang_pred`,
    scrubbed ``text``, the PII counts, and ``fp`` (the post-scrub
    fingerprint — what the sink should append to the corpus fp table
    to close the loop for the next window).

    Order matters and is deliberate: the gate runs FIRST (cheap
    arithmetic drops junk before regex-heavy scrubbing), scrubbing
    runs BEFORE fingerprinting (two docs differing only in their PII
    literals dedup to one — and the fingerprint of record matches
    what the corpus actually stores).

    ``quality_model`` (r12): a trained
    :func:`llm_ops.quality_model.nb_train` frame adds the learned
    vocabulary gate between the heuristic gate and the scrub — the
    SAME stage order as the batch pipeline's 2c, and the same
    stateless shape (a static 1-row broadcast of the dense weight
    array into the stream; scoring is a per-row map, so a document
    admitted online is the document a batch rebuild would admit —
    the module's stream/batch parity promise extends to the learned
    gate). ``nbq_score`` rides on the admitted rows.

    ``dsir_model`` + ``dsir_min_key`` (r17 wave 4): the DSIR
    distribution-matching gate, online. A stream cannot run the
    batch selection's corpus-global running totals, but the batch
    boundary IS a fixed quantized-key threshold — calibrate it once
    from a batch :func:`llm_ops.dsir.dsir_resample` run (the
    smallest selected ``dsir_key >> key_shift``) and every online
    verdict reproduces the batch decision exactly: the hash-Gumbel
    noise is content-stable, so ``(logw + G(id)) >> shift ≥
    dsir_min_key`` is deterministic per document. Same stateless
    broadcast-scoring shape as the NB gate (a dense weight array in
    a 1-row static broadcast, per-row aggregate — no state, no
    shuffle). ``dsir_logw`` and ``dsir_key`` ride on admitted rows;
    ``dsir_gumbel=False`` gates on the noise-free weight (the top-k
    ablation form).

    ``gopher=True`` (r18 — the r17 verdict's item 4): conjoin the
    published Gopher §A1.1 structural rules into the page gate, the
    SAME stage position as the batch pipeline's
    ``PipelineConfig.gopher`` (llm_ops/pipeline.py stage 2a) and the
    same shared expressions (text.gopher_features/gopher_pass) — the
    rules are pure column projections, so they run in-query on the
    stream with no state; ``gopher_min_words`` is the one tunable
    knob, as in batch. The §A1.2 REPETITION rules are doc-keyed
    aggregations and cannot run in-query — see
    :func:`ingest_stream_semantic`'s ``gopher_repetition``."""
    feats = quality_features(stream, text_col)
    page_gate = gate if gate is not None else default_quality_gate()
    gopher_cols: list[str] = []
    if gopher:
        from ..llm_ops.text import gopher_features, gopher_pass

        feats = gopher_features(feats, text_col)
        page_gate = page_gate & gopher_pass(min_words=gopher_min_words)
        gopher_cols = [
            "g_n_words", "g_mean_word_len", "g_symbol_ratio",
            "g_bullet_line_frac", "g_ellipsis_line_frac",
            "g_alpha_word_frac", "g_stopword_hits",
        ]
    gated = feats.filter(page_gate).drop(
        "n_chars_calc", "n_tokens", "avg_token_len", "punct_ratio",
        "stopword_ratio", *gopher_cols
    )
    if quality_model is not None:
        from ..llm_ops.quality_model import nb_quality_gate

        gated = nb_quality_gate(
            gated,
            quality_model,
            text_col=text_col,
            threshold=quality_model_threshold,
            ngrams=quality_model_ngrams,
        )
    if dsir_model is not None:
        if dsir_min_key is None:
            raise ValueError(
                "dsir_model given without dsir_min_key — calibrate the "
                "selection boundary from a batch dsir_resample run (the "
                "smallest selected quantized key)"
            )
        from ..llm_ops.dsir import (
            DSIR_KEY_SHIFT,
            dsir_score,
            hash_gumbel,
        )

        shift = DSIR_KEY_SHIFT if dsir_key_shift is None else dsir_key_shift
        key = F.col("dsir_logw")
        if dsir_gumbel:
            key = key + hash_gumbel(F.col(dsir_id_col))
        gated = (
            dsir_score(gated, dsir_model, text_col=text_col, ngrams=dsir_ngrams)
            .withColumn("dsir_key", key.cast("long"))
            .filter(
                F.call_function(
                    "shiftright", F.col("dsir_key"), F.lit(int(shift))
                )
                >= F.lit(int(dsir_min_key))
            )
        )
    scrubbed = (
        scrub_pii(gated, text_col, out_col="_text_scrubbed")
        .withColumn(text_col, F.col("_text_scrubbed"))
        .drop("_text_scrubbed")
    )
    tagged = scrubbed.withColumn("lang_pred", lang_id(F.col(text_col)))
    return dedup_stream_against_corpus(
        tagged,
        corpus_fps,
        text_col=text_col,
        event_time_col=event_time_col,
        watermark=watermark,
    )


def ingest_stream_semantic(
    stream: DataFrame,
    corpus_fps: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    gate: Column | None = None,
    gopher: bool = False,
    gopher_min_words: int = 50,
    gopher_repetition: bool = False,
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
    quality_model: DataFrame | None = None,
    quality_model_threshold: int = 0,
    quality_model_ngrams: int | str = 1,
    dsir_model: DataFrame | None = None,
    dsir_min_key: int | None = None,
    dsir_gumbel: bool = True,
    dsir_ngrams: int | str = 2,
    semantic_cos: int = 92,
    semantic_dim: int = 16,
    semantic_max_chars: int = 256,
    semantic_planes: int = 8,
    semantic_tables: int = 8,
    perplexity_model: dict | str | None = None,
    perplexity_max_bits: float | None = None,
    perplexity_backoff_bits: int = 4,
) -> "StreamingQuery":
    """The full online corpus gate WITH the r14 semantic stage: the
    :func:`ingest_stream` chain (heuristic gate → optional learned
    gate → PII scrub → lang tag → exact dedup) followed by the
    SemDeDup-style semantic gate (streaming/semantic.py) — the same
    stage order as the batch pipeline's 2c→3→4→5a. Admitted rows
    append to ``out_dir``; semantic bucket state lives in
    ``store_dir``, watermark-bounded when ``event_time_col`` is
    given. Returns the started StreamingQuery (caller stops it).

    The semantic stage is a ``foreachBatch`` sink (pairwise
    integer-cosine decisions against LSH-bucketed state won't
    compose as a third in-query stateful operator — see
    streaming/semantic.py), so unlike :func:`ingest_stream` this
    returns a running query, not a DataFrame.

    ``perplexity_model`` + ``perplexity_max_bits`` (r17 — the r16
    verdict's item 3): the CCNet-style LM gate, online. A persisted
    reference model (an ``ngram_lm.lm_save`` directory path, or an
    already-loaded fit-model dict — bigram or trigram, laplace or
    kn) is loaded ONCE at wiring time; every micro-batch is scored
    against it inside the foreachBatch turn (the lag() window the
    scorer needs is unsupported in-query on a stream) and documents
    over ``perplexity_max_bits`` bits/token — or with no tokens —
    are dropped BEFORE semantic admission, so a gibberish page that
    passes the heuristics never enters the semantic store. Scoring
    order differs from the batch pipeline in one documented way:
    the stream scores post-scrub text (the scrub is an in-query
    stage here), the batch pipeline scores pre-scrub; decisions
    agree for any document whose tokens the scrub leaves alone, and
    the stream side is pinned equal to batch scoring OF THE SAME
    ROWS by pytest.

    ``gopher`` / ``gopher_repetition`` (r18 — the r17 verdict's item
    4): the two batch Gopher stages, online. The §A1.1 structural
    rules (``gopher=True``) are pure column expressions and run
    in-query inside :func:`ingest_stream` at the batch stage-2a
    position. The §A1.2 repetition rules (``gopher_repetition=True``)
    are doc-keyed aggregations (positioned n-gram explodes + per-doc
    fraction windows) — unsupported in-query on a stream — so they
    run inside the foreachBatch turn as the FIRST pre-gate stage,
    before the LM gate, mirroring the batch order (pipeline stage 2b
    precedes the perplexity cut). Both reuse the batch expressions
    verbatim (text.gopher_features / gopher_repetition_features), so
    a document admitted online is the document a batch rebuild with
    the same flags would admit — pinned by pytest with planted
    structural and repetition violators."""
    from .semantic import semantic_dedup_stream

    admitted = ingest_stream(
        stream,
        corpus_fps,
        text_col=text_col,
        gate=gate,
        gopher=gopher,
        gopher_min_words=gopher_min_words,
        event_time_col=event_time_col,
        watermark=watermark,
        quality_model=quality_model,
        quality_model_threshold=quality_model_threshold,
        quality_model_ngrams=quality_model_ngrams,
        dsir_model=dsir_model,
        dsir_min_key=dsir_min_key,
        dsir_gumbel=dsir_gumbel,
        dsir_ngrams=dsir_ngrams,
        dsir_id_col=id_col,
    )
    pre_gates = []
    if gopher_repetition:
        from ..llm_ops.text import gopher_repetition_features

        def rep_gate(batch: DataFrame) -> DataFrame:
            # micro-batches are bounded, so the features' 3-way
            # input fan-out recomputes a bounded frame; the left-semi
            # keeps only rep_pass docs — identical decision to the
            # batch pipeline's stage 2b over the same rows
            rep = gopher_repetition_features(
                batch, text_col, id_col, materialize=False
            )
            keep = rep.filter(F.col("rep_pass")).select(
                F.col("doc_id").alias(id_col)
            )
            return batch.join(keep, id_col, "left_semi")

        pre_gates.append(rep_gate)
    if perplexity_model is not None:
        if perplexity_max_bits is None:
            raise ValueError(
                "perplexity_model given without perplexity_max_bits — the "
                "gate needs a threshold"
            )
        from ..llm_ops.ngram_lm import lm_load, lm_score, perplexity_gate

        model = (
            lm_load(stream.sparkSession, perplexity_model)
            if isinstance(perplexity_model, str)
            else perplexity_model
        )

        def ppl_gate(batch: DataFrame) -> DataFrame:
            kw = (
                {"backoff_bits": perplexity_backoff_bits}
                if model.get("order", 2) == 2
                else {"backoff_bits_bi": perplexity_backoff_bits,
                      "backoff_bits_uni": 2 * perplexity_backoff_bits}
            )
            scores = lm_score(batch, model, text_col=text_col, id_col=id_col, **kw)
            fluent = scores.filter(perplexity_gate(perplexity_max_bits)).select(
                F.col("doc_id").alias(id_col)
            )
            return batch.join(fluent, id_col, "left_semi")

        pre_gates.append(ppl_gate)

    pre_gate = None
    if pre_gates:

        def pre_gate(batch: DataFrame) -> DataFrame:
            for g in pre_gates:
                batch = g(batch)
            return batch

    return semantic_dedup_stream(
        admitted,
        store_dir,
        out_dir,
        checkpoint_dir=checkpoint_dir,
        pre_gate=pre_gate,
        id_col=id_col,
        text_col=text_col,
        cos_num=semantic_cos,
        dim=semantic_dim,
        max_chars=semantic_max_chars,
        n_planes=semantic_planes,
        n_tables=semantic_tables,
        event_time_col=event_time_col,
        watermark=watermark,
    )
