"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with the noop sink (no
driver-side collect — the data path stays distributed, as it must at
100 TB).

Pass ordering: the TIMED sf pass runs FIRST in a fresh JVM, and the
sf/10 scaling-slope pass runs AFTER it — so the slope pass can never
perturb the headline numbers via accumulated JVM/GC/codegen-cache
state (the round-3 bench ran lo-before-hi and the iterative dedup
queries regressed ~1.5-2× from exactly that).

BENCH_ISOLATE=1 goes further: each set (hi, lo) runs in its own
subprocess JVM, so the two are fully independent — the
attribution/A-B mode for harness-effect questions.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tam_flagship",
    "vintage_union",
    "window_allocation",
    "grouped_total_join",
    "multi_key_join",
    "conditional_pivot",
    "union_conform",
    "events_hourly",
    "missing_cost_full_join",
    "scalar_funcs",
    # llm ops (present once suite/llm.py is populated)
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_capped",
    "dedup_groups",
    "dedup_pipeline",
    "text_quality",
    "embedding_topk",
    "embedding_lsh",
    "dataset_split",
    "shard_plan",
    "corpus_rollup",
    # round-4 operators (added round 5 — oracle-green but previously
    # perf-invisible; regex chains and explodes over long documents
    # are exactly the costs that drift)
    "pii_scrub",
    "decontaminate",
    "pack_plan",
    "text_repetition",
    "stratified_sample",
    # round-6 operators (new rows — the 26 rows above stay 1:1
    # comparable with BASELINE_r4.md)
    "dedup_incremental",
    "chunk_plan",
    "source_filter",
    "compact_latest",
    "embedding_pq",
    # round-7 operators (new rows; the 26 rows above BASELINE_r4
    # stay 1:1 comparable)
    "asof_join",
    "interval_join",
    "rolling_agg",
    "cube_agg",
    # round-8: real BPE merge application (iterative parallel-round
    # engine — the rounds loop is exactly the cost that needs a
    # perf row)
    "bpe_encode",
    # round-9: HTML->text extraction (a ~30-step chained regex scan
    # over every document — regex-engine drift is exactly the cost
    # class pii_scrub's history says needs a row)
    "html_text",
    # round-9: URL canonicalization (regexp_extract + array
    # filter/sort chain — same scan-bound cost class)
    "url_normalize",
    # round-9: Gopher quality rules (line/word array lambdas over
    # every document)
    "gopher_rules",
    # round-10: span-level exact-substring dedup (positional k-gram
    # posting lists + a window merge — the gram explode and the
    # gram-keyed join are the costs that drift)
    "dedup_spans",
    # round-10: registrable-domain rollup (regexp host extraction +
    # label-array fold + one domain-keyed exchange)
    "domain_stats",
    # round-11: temperature-weighted mixture plan + hash applier
    # (source aggregation + dimension-sized window + broadcast-join
    # scan filter)
    "mixture_plan",
    # round-12: model-based quality classifier (token explode +
    # bucket-keyed training agg, then a broadcast-array scoring scan
    # — the per-token element_at fold is the cost that drifts)
    "quality_classifier",
    # round-12: script detection + the widened 20-language/8-script
    # lang_id (ten per-script regex scans + a 20-way stopword
    # intersect argmax — the regex-scan-count cost class)
    "script_detect",
    # round-13: in-engine embedding generation (gram explode + 16
    # codegen bit-sum aggregates — the scan+explode cost class) and
    # the composed semantic dedup (embed -> LSH bucket self-join ->
    # integer cosine -> pointer-doubling CC; the iterative-rounds
    # cost class like dedup_groups, plus the candidate-join volume)
    "embedding_generate",
    "semantic_dedup",
    # round-13: unigram-LM tokenizer (seed-substring candidates +
    # hard-EM Viterbi rounds + per-word DP folds — the
    # iterative-trainer cost class beside bpe_encode)
    "unigram_encode",
    # round-18: SentencePiece-style byte fallback — whitespace/case-
    # kept tokenization over a synthesized multi-script corpus, the
    # <0xNN> expansion on vocab-unknown pieces; the encode cost
    # class of unigram_encode plus the wider distinct-word table
    "unigram_byte_fallback",
    # round-18: PDF text extraction — synth classic-xref corpus +
    # the vendored parser over mapInPandas (Arrow batches); the
    # per-document cost class of the image/audio real decodes
    "pdf_text",
    # round-18: the mixed-format ingestion router — binary sniff +
    # three extraction legs (pdf UDF / html codegen / text) + union
    "doc_ingest",
    # round-14: soft (expected-count) EM unigram training — the
    # forward-backward folds over every distinct word's lattice are
    # the iterative-trainer cost class one notch heavier than the
    # Viterbi E-step; bench-only (float variant, pytest-twin-gated,
    # no SQL oracle by design)
    "unigram_soft",
    # round-15 (r14 verdict item 7): the SAMPLED-segmentation corpus
    # build — train soft-EM once (untimed, cached on the sf dir),
    # then the composed pipeline tokenizes every doc through the
    # md5-seeded lattice filtration (unigram_sample_docs) with piece
    # budgets denominated in sampled pieces; bench-only (sampling is
    # twin-gated, no SQL oracle by design)
    "unigram_sampled",
    # round-16: perceptual image hashing (binary synth + full decode/
    # resample/hash inside one Arrow mapInPandas pass — the
    # per-payload Python-codec cost class, new this round) and the
    # bigram-LM perplexity scorer (explode + per-doc lag window +
    # three count joins — the window-shuffle cost class)
    "image_phash",
    "ngram_perplexity",
    # round-16 wave 2: the trigram-order form — one more lag column,
    # two more count joins (the n-gram-order scaling cost)
    "trigram_perplexity",
    # round-16: PCM WAV decode + stats (same Arrow-batch binary cost
    # class as image_phash, audio flavor)
    "audio_pcm",
    # round-17: Kneser-Ney smoothing, ref-split 80/20 — same window +
    # count-join plan as the laplace rows plus the continuation-count
    # aggregates and a second training-words branch (the ref-scored
    # deployment shape)
    "ngram_perplexity_kn",
    "trigram_perplexity_kn",
    # round-17: the audio near-dup chain (synth + decode + envelope
    # fingerprint inside one Arrow pass, then banding + CC — the
    # image_neardup cost class, audio flavor)
    "audio_neardup",
    # round-17 wave 2: the published order-5 KN — four lag columns on
    # one window + eight key-bucketed count/context SMJs (the
    # n-gram-order scaling cost at its published depth)
    "pentagram_perplexity_kn",
    # round-17 wave 3: count-threshold pruning at order 4 — the
    # deployable-model shape; should price close to an unpruned
    # order-4 run (the kept filter + two FILTER aggregates are the
    # only additions)
    "kn_pruned_perplexity",
    # round-17 wave 3: the head/middle/tail split — the bigram-score
    # plan plus one distinct-key agg, a key-table window and a
    # broadcast join-back (the consuming step of the CCNet recipe)
    "perplexity_buckets",
    # round-17 wave 4: DSIR selection — fit (one explode + bucket
    # agg) + zero-shuffle scoring + the bounded key-group selection;
    # should price near quality_classifier (same fit/score shape,
    # bigram features, plus the tiny group window)
    "dsir_select",
    # round-17 wave 6: D4 cluster-balanced sampling — the IVF build
    # cost (3 Lloyd's iterations) plus one cluster-partitioned rank
    # window; should price at embedding_ivf minus the search leg
    "cluster_balanced_sample",
    # round-17 wave 5: the full Gopher repetition set — the 9-order
    # positioned n-gram explode is the cost driver (inherent to the
    # published rule); aggregations all doc-keyed
    "gopher_repetition",
    # round-17 wave 4: fuzzy decontamination — two shingle+minhash
    # legs (corpus + derived eval) and a broadcast band join; should
    # price near dedup_minhash plus the small eval leg
    "decontaminate_fuzzy",
    # round-18: the video container near-dup chain (synth + box walk
    # + mdat envelope fingerprint inside one Arrow pass, then
    # banding + duration guard + CC — the audio_neardup cost class,
    # video flavor)
    "video_neardup",
    # round-7: the COMPOSED corpus build as its own row — regressions
    # in the composition (stage chaining, the branch-point persist,
    # shuffle reuse between stages), not just in its member
    # operators, must show up here
    "corpus_e2e",
]


def _corpus_e2e(spark, sf_dir: str):
    """The composed build_training_corpus at fixed params; forcing
    the shard plan forces every upstream stage (gate -> reputation ->
    scrub -> exact dedup -> near-dup -> split -> shards). Not a
    driver-window key (the composition's pieces are each oracle-gated
    individually; the composition itself is plan-gated at x20 scale
    in pytest) — a bench-only entry."""
    from gcp_dataengineering_spark.llm_ops.pipeline import (
        PipelineConfig,
        build_training_corpus,
    )
    from gcp_dataengineering_spark.ops.scan import fan_out_scan

    docs = fan_out_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    stages = build_training_corpus(
        docs,
        config=PipelineConfig(shard_budget_tokens=200_000),
        # the realistic production configuration: branch points pinned
        # so the corpus is scanned once, not 4x (see pipeline.py)
        materialize=None,
    )
    return stages["shards"]


def _unigram_soft(spark, sf_dir: str):
    """Soft-EM unigram training over the documents fixture at the
    unigram_encode key's shape parameters (vocab 200, L=5, 1 round) —
    the expected-count E-step (forward-backward per distinct word +
    the micro-rounded piece aggregation) is the timed surface."""
    from gcp_dataengineering_spark.llm_ops.unigram import unigram_train_soft

    # no fan-out here: soft-EM training aggregates to the distinct-word
    # table immediately, so the map side is light and the full-payload
    # fan-out exchange measured as pure tax (second-session A/B)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return unigram_train_soft(
        docs, vocab_size=200, max_piece_len=5, em_iters=1, materialize=None
    )


# trained vocab per sf dir, pinned: the unigram_sampled row times the
# SAMPLED TOKENIZATION under the composed pipeline, not the trainer
# (unigram_soft above already times that surface)
_UNIGRAM_VOCAB_CACHE: dict[str, object] = {}


def _unigram_sampled(spark, sf_dir: str):
    """r15: the composed corpus build with subword-regularization
    sampling — every doc tokenizes through the md5-seeded lattice
    filtration (unigram.unigram_sample_docs via PipelineConfig
    unigram_vocab + unigram_sample_alpha), budgets/shards denominated
    in sampled pieces; forcing the shard plan forces the whole chain.
    The soft-EM vocab is trained once per sf dir OUTSIDE the timed
    surface (cached, localCheckpoint-pinned)."""
    from gcp_dataengineering_spark.llm_ops.pipeline import (
        PipelineConfig,
        build_training_corpus,
    )
    from gcp_dataengineering_spark.ops.scan import fan_out_scan

    docs = fan_out_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    vocab = _UNIGRAM_VOCAB_CACHE.get(sf_dir)
    if vocab is None:
        from gcp_dataengineering_spark.llm_ops.unigram import (
            unigram_train_soft,
        )

        vocab = unigram_train_soft(
            docs, vocab_size=200, max_piece_len=5, em_iters=1,
            materialize=None,
        ).localCheckpoint()
        _UNIGRAM_VOCAB_CACHE[sf_dir] = vocab
    stages = build_training_corpus(
        docs,
        config=PipelineConfig(
            shard_budget_tokens=200_000,
            unigram_vocab=vocab,
            unigram_sample_alpha=0.2,
        ),
        materialize=None,
    )
    return stages["shards"]


BENCH_EXTRA = {
    "corpus_e2e": _corpus_e2e,
    "unigram_soft": _unigram_soft,
    "unigram_sampled": _unigram_sampled,
}


def _time_set(spark, qs, sf_dir: str, warm_dir: str, runs: int) -> dict[str, float]:
    """Best-of-N wall time per headline query at sf_dir, with a per-query
    codegen/JIT warmup pass at warm_dir: the generated code is identical
    across scale factors, so compile cost (5-20 s/query on this VM) is
    charged to warmup, not to the timed run — the steady-state number is
    the signal that scales to 100 TB."""
    only = {
        k.strip()
        for k in os.environ.get("BENCH_ONLY", "").split(",")
        if k.strip()
    }
    times: dict[str, float] = {}
    for key in HEADLINE:
        fn = qs.get(key)
        if fn is None or (only and key not in only):
            continue
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as ex:
                # a warmup failure usually means the timed run fails too —
                # make it visible instead of silently mis-charging codegen
                print(f"bench: warmup failed for {key}: {ex}", file=sys.stderr)
        # best-of-2 by default: this VM shows multi-second scheduler
        # jitter (observed 0.5s -> 15s swings on identical plans), and
        # best-of-N is the standard defense; BENCH_RUNS=1 for a quick
        # single pass
        best = float("inf")
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[key] = round(best, 3)
    return times


def _bench_queries(entry_mod) -> dict:
    """The FULL pair universe, not the driver's rotating 50-key
    window: headline perf rows must stay 1:1 comparable with the
    baseline anchor regardless of which keys the rotation shows the
    driver this round (entry queries() kept as fallback for older
    checkouts), plus the bench-only composed entries."""
    try:
        from gcp_dataengineering_spark.suite import _all_pairs

        qs, _ = _all_pairs()
        qs = dict(qs)
    except ImportError:
        qs = dict(entry_mod.queries())
    qs.update(BENCH_EXTRA)
    return qs


def _run_one_set(sf_dir: str, runs: int) -> dict[str, float]:
    """Time the headline set at sf_dir in THIS process's Spark session."""
    import __spark_entry__ as e
    from gcp_dataengineering_spark.session import get_spark

    spark = get_spark("bench")
    qs = _bench_queries(e)
    # JVM/codegen warmup on a trivial action so q1 isn't charged for it
    spark.range(1000).selectExpr("sum(id)").collect()
    times = _time_set(spark, qs, sf_dir, "/root/testdata/sf0.001", runs)
    spark.stop()
    return times


def _run_set_isolated(sf_dir: str, runs: int) -> dict[str, float]:
    """Fork a fresh python+JVM to time one set — zero shared state."""
    env = dict(os.environ)
    env["BENCH_CHILD_SF_DIR"] = sf_dir
    env["BENCH_RUNS"] = str(runs)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        # surface the child JVM/Spark failure, not an opaque
        # CalledProcessError with hidden captured streams
        # Spark/py4j children often print the real traceback to STDOUT
        # (py4j protocol errors especially) — include both tails or a
        # real failure can surface with an empty diagnostic
        raise RuntimeError(
            f"bench child for {sf_dir} exited {proc.returncode}; "
            f"stderr tail:\n{proc.stderr[-4000:]}\n"
            f"stdout tail:\n{proc.stdout[-2000:]}"
        )
    # child prints exactly one JSON line on its last stdout line
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    try:
        parsed = json.loads(lines[-1]) if lines else None
    except json.JSONDecodeError as ex:
        raise RuntimeError(
            f"bench child for {sf_dir} printed non-JSON last line "
            f"{lines[-1]!r}: {ex}\nstderr tail:\n{proc.stderr[-2000:]}"
        ) from ex
    if not isinstance(parsed, dict):
        raise RuntimeError(
            f"bench child for {sf_dir} returned {type(parsed).__name__}, "
            f"expected a dict of query times: {parsed!r}"
        )
    return parsed


def main() -> None:
    if "--child" in sys.argv:
        times = _run_one_set(os.environ["BENCH_CHILD_SF_DIR"], int(os.environ.get("BENCH_RUNS", "2")))
        print(json.dumps(times))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    isolate = os.environ.get("BENCH_ISOLATE", "0") != "0"

    # BENCH_MEDIAN_RUNS=N: the RECORDED-bench protocol (round 6+) —
    # N fully isolated full-set runs (fresh subprocess JVM each),
    # per-query MEDIANS published. Single full-set runs on this VM
    # carry 2-3x per-query scheduler noise (BENCH_ATTRIBUTION.md);
    # only isolated medians are evidence. Raw runs ride along so the
    # medians are auditable.
    median_runs = int(os.environ.get("BENCH_MEDIAN_RUNS", "0"))
    if median_runs > 0:
        import statistics

        all_runs = [_run_set_isolated(sf_dir, runs) for _ in range(median_runs)]
        keys = [k for k in HEADLINE if all(k in r for r in all_runs)]
        med = {k: round(statistics.median(r[k] for r in all_runs), 3) for k in keys}
        print(json.dumps({
            "metric": "headline_queries_total_wall",
            "value": round(sum(med.values()), 3),
            "unit": "sec",
            "queries": med,
            "sf": sf,
            "protocol": f"isolated-median-x{median_runs}",
            "runs": all_runs,
        }))
        return

    # Scaling-slope pass: the same set one decade smaller, run AFTER
    # the timed pass (or in its own JVM under BENCH_ISOLATE).
    # Known bias of the non-isolated ordering: the lo pass runs in a
    # JVM warmed by the hi pass, deflating t_lo and INFLATING slope =
    # t_hi / t_lo — a conservative bias (false superlinear alarms are
    # possible; hidden superlinearity is not masked). BENCH_ISOLATE=1
    # gives the unbiased slope at the cost of a second JVM start.
    # slope[q] = t(sf) / t(sf/10); linear scaling gives <= ~10 (usually
    # far less here, where fixed scheduler latency dominates small
    # queries) — a ratio > 10 flags hidden super-linear behavior a
    # single-SF bench can't see. BENCH_SLOPE=0 disables the extra pass.
    lo_dir = os.environ.get("SPARK_GRAFT_SF_LO_DIR", "/root/testdata/sf0.01")
    do_slope = (
        os.environ.get("BENCH_SLOPE", "1") != "0"
        and os.path.isdir(lo_dir)
        and os.path.realpath(lo_dir) != os.path.realpath(sf_dir)
    )

    # BENCH_LO_FIRST=1 restores the round-3 ordering (slope pass
    # before the timed pass, same JVM) — the A/B control for
    # attributing harness-ordering effects; never the default.
    lo_first = os.environ.get("BENCH_LO_FIRST", "0") != "0"

    if isolate:
        times = _run_set_isolated(sf_dir, runs)
        times_lo = _run_set_isolated(lo_dir, runs) if do_slope else {}
    else:
        # Single JVM: timed hi pass FIRST (fresh JVM ≈ clean state),
        # slope pass after — it reuses the warm JVM but cannot feed
        # back into the published headline numbers.
        import __spark_entry__ as e
        from gcp_dataengineering_spark.session import get_spark

        spark = get_spark("bench")
        qs = _bench_queries(e)
        spark.range(1000).selectExpr("sum(id)").collect()
        warm_dir = "/root/testdata/sf0.001"
        times_lo = {}
        if do_slope and lo_first:
            times_lo = _time_set(spark, qs, lo_dir, warm_dir, runs)
        times = _time_set(spark, qs, sf_dir, warm_dir, runs)
        if do_slope and not lo_first:
            times_lo = _time_set(spark, qs, lo_dir, warm_dir, runs)
        spark.stop()

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if do_slope:
        sf_lo = float(os.path.basename(lo_dir.rstrip("/")).replace("sf", "") or 0.01)
        slope = {
            k: round(times[k] / times_lo[k], 2)
            for k in times
            if k in times_lo and times_lo[k] > 0
        }
        out["sf_lo"] = sf_lo
        out["queries_lo"] = times_lo
        out["slope"] = slope
        out["superlinear"] = sorted(
            k for k, r in slope.items() if r > (sf / sf_lo) * 1.2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
