"""Structured Streaming: the streaming hourly aggregation must match
the batch form (same logic, memory sink, synchronous drain)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from gcp_dataengineering_spark.streaming.windowed import batch_hourly, stream_hourly

SF_DIR = "/root/testdata/sf0.001"


def test_sessionize_stream_matches_batch_closed_sessions(spark):
    """The applyInPandasWithState sessionizer, driven by one parquet
    micro-batch, must emit exactly the batch form's sessions minus
    each user's final (still-open) session."""
    import pyspark.sql.functions as F

    from gcp_dataengineering_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )
    from gcp_dataengineering_spark.streaming.windowed import with_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch_events = with_event_time(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    expect_all = sessionize_batch(batch_events).collect()
    last_session = {}
    for r in expect_all:
        last_session[r["user_id"]] = max(last_session.get(r["user_id"], 0), r["session_id"])
    expect = sorted(
        tuple(r)
        for r in expect_all
        if r["session_id"] != last_session[r["user_id"]]
    )

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    prepared = with_event_time(stream).select(
        "user_id", F.col("ts_ts").cast("double").alias("ts_sec"), "value"
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(prepared)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect())
    finally:
        q.stop()
    assert len(got) > 0
    assert got == expect


def test_sessionize_stream_flushes_idle_tail_on_timeout(spark, tmp_path):
    """With idle_timeout_ms set, an idle user's open tail session is
    emitted by the engine's timeout batch — the production flush mode
    (VERDICT r1 gap #4). NOTE: processAllAvailable never quiesces
    once processing-time timeouts are registered (the engine keeps
    scheduling timeout-check batches), so the sink is polled."""
    import time

    from gcp_dataengineering_spark.streaming.sessionize import sessionize_stream

    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, ts_sec double, value double"
    # user 1 has two events in one session, then goes idle forever
    spark.createDataFrame([(1, 1000.0, 2.0), (1, 1010.0, 3.0)], schema).coalesce(
        1
    ).write.parquet(str(src / "b1.parquet"))

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*.parquet")
    name = f"sess_to_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream, idle_timeout_ms=1000)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            if rows:
                break
            time.sleep(0.5)
        assert [tuple(r) for r in rows] == [(1, 1, 2, 1000, 1010, 5.0)]
    finally:
        q.stop()


def test_sessionize_event_time_replay_matches_batch(spark, tmp_path):
    """EventTimeTimeout mode (VERDICT r2 item 8): replaying
    out-of-order historical events across micro-batches yields
    EXACTLY the batch form's sessions — including each user's tail
    session, flushed when the watermark (not wall-clock) passes
    last + gap. A far-future sentinel user advances the watermark
    past every real tail; its own session stays open and is excluded
    from the comparison."""
    import datetime as dt
    import os
    import time

    from gcp_dataengineering_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream_event_time,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(u, sec, v):
        return (u, base + dt.timedelta(seconds=sec), v)

    # Arrival order is deliberately NOT event-time order — batch 2
    # delivers events earlier than batch 1's (within the watermark
    # delay), including one that extends user 1's first session
    # backwards-in-arrival-order.
    micro_batches = [
        [ev(1, 0, 1.0), ev(1, 100, 2.0), ev(2, 50, 1.5), ev(1, 1000, 3.0)],
        [ev(1, 40, 1.0), ev(2, 80, 2.5), ev(2, 2000, 1.0)],
        [ev(1, 1100, 1.0), ev(99, 100000, 0.0)],  # sentinel advances watermark
    ]
    schema = "user_id long, ts_ts timestamp, value double"
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(micro_batches):
        p = src / f"b{i}.parquet"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(p))
        mtime = time.time() + i  # force file-source pickup order
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    real = [r for rows in micro_batches for r in rows if r[0] != 99]
    expect = sorted(
        tuple(r) for r in sessionize_batch(spark.createDataFrame(real, schema)).collect()
    )

    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "b0.parquet")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    name = f"sess_et_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream_event_time(stream, watermark_delay="2000 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # the tail-flushing no-data batch can land just after
        # processAllAvailable returns; poll briefly for the full set
        deadline = time.time() + 60
        got = []
        while time.time() < deadline:
            got = sorted(tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect())
            if len(got) >= len(expect):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert got == expect and len(got) == 4


def test_stream_matches_batch(spark):
    name = f"ev_{uuid.uuid4().hex[:8]}"
    q = (
        stream_hourly(spark, SF_DIR)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    expect = batch_hourly(spark, SF_DIR).collect()
    key = lambda r: (r["hour_start"], r["event_type"])
    gs = sorted([(key(r), r["n"], round(r["total_value"], 4)) for r in got])
    es = sorted([(key(r), r["n"], round(r["total_value"], 4)) for r in expect])
    assert gs == es and len(gs) > 0


def test_dedup_stream_drops_watermark_window_dups(spark, tmp_path):
    """Streaming exact dedup: re-arrivals of a fingerprint within the
    watermark window are dropped; each key's first arrival is
    emitted."""
    from gcp_dataengineering_spark.streaming.dedup import dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    schema = "fp string, ts timestamp, doc string"
    rows = [
        ("a", "2024-01-01 10:00:00", "doc-a"),
        ("b", "2024-01-01 10:00:05", "doc-b"),
        ("a", "2024-01-01 10:00:30", "doc-a-dup"),   # dup within window
        ("c", "2024-01-01 10:01:00", "doc-c"),
        ("b", "2024-01-01 10:02:00", "doc-b-dup"),   # dup within window
    ]
    df = spark.createDataFrame(
        [(f, __import__("datetime").datetime.fromisoformat(t), d) for f, t, d in rows],
        schema,
    )
    df.coalesce(1).write.parquet(str(src / "b1.parquet"))

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*.parquet")
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_stream(stream, ["fp"], "ts", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["fp"]: r["doc"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        q.stop()
    assert got == {"a": "doc-a", "b": "doc-b", "c": "doc-c"}


def test_sessionize_event_time_timeout_armed_from_first_open_session(spark):
    """With 2+ open sessions buffered, the event-time timeout must be
    armed from the FIRST remaining session's end + gap (the earliest
    watermark that can close anything) — arming from the LAST session's
    end (the round-3 behavior) delays earlier sessions' flush until
    that later deadline or the next data batch."""
    import pandas as pd

    from gcp_dataengineering_spark.streaming import sessionize as SZ

    captured = {}

    class Probe:
        def withWatermark(self, *a):
            return self

        def select(self, *a):
            return self

        def groupBy(self, *a):
            return self

        def applyInPandasWithState(self, fn, *a, **k):
            captured["fn"] = fn
            return None

    class FakeState:
        def __init__(self, wm_ms):
            self._v, self.hasTimedOut, self._wm = None, False, wm_ms
            self.armed = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v = None

        def getCurrentWatermarkMs(self):
            return self._wm

        def setTimeoutTimestamp(self, ts):
            self.armed = ts

    SZ.sessionize_stream_event_time(Probe(), gap_seconds=300)
    fn = captured["fn"]

    # two sessions: A = [1000, 1010], B = [5000]; watermark 900 s —
    # neither closeable yet, both stay buffered
    st = FakeState(wm_ms=900_000)
    out = list(
        fn(
            (1,),
            iter([pd.DataFrame({"ts_sec": [1000.0, 1010.0, 5000.0], "value": [2.0, 3.0, 1.0]})]),
            st,
        )
    )
    assert out == [] and st.exists
    assert st.armed == (1010 + 300) * 1000 + 1  # session A's deadline, NOT B's 5300001


def test_sessionize_timeout_tombstone_preserves_session_ids(spark):
    """Deterministic check of the two-phase eviction logic: after a
    timeout flush the session counter survives as a tombstone, so a
    returning user continues ordinal ids instead of reusing one; a
    tombstone that times out again is fully evicted."""
    import pandas as pd

    from gcp_dataengineering_spark.streaming import sessionize as SZ

    class FakeState:
        def __init__(self):
            self._v, self.hasTimedOut, self.removed = None, False, False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v, self.removed = None, True

        def setTimeoutDuration(self, ms):
            pass

    # Recreate the closure fn by calling sessionize_stream is not
    # possible without a streaming DF; drive the same logic through a
    # tiny shim that mirrors fn's contract instead.
    def run_fn(state, rows):
        out = []
        gap, idle = 300, 1000

        def batches():
            yield pd.DataFrame(rows, columns=["ts_sec", "value"])

        # inline reimplementation would defeat the test; instead call
        # the real applyInPandasWithState function object extracted
        # from the operator via a probe DataFrame
        fn = extract_fn()
        for pdf in fn((1,), batches(), state):
            out.extend(pdf.to_dict("records"))
        return out

    captured = {}

    class Probe:
        def groupBy(self, *a):
            return self

        def applyInPandasWithState(self, fn, *a, **k):
            captured["fn"] = fn
            return None

    def extract_fn():
        if "fn" not in captured:
            SZ.sessionize_stream(Probe(), gap_seconds=300, idle_timeout_ms=1000)
        return captured["fn"]

    st = FakeState()
    # batch 1: one session for user 1
    assert run_fn(st, [(1000.0, 2.0), (1010.0, 3.0)]) == []
    assert st.get[0] == 1  # open session id 1
    # timeout fires: tail session flushed, tombstone keeps sid
    st.hasTimedOut = True
    flushed = run_fn(st, [])
    assert [r["session_id"] for r in flushed] == [1]
    assert st.exists and st.get[0] == 1 and st.get[3] == 0  # tombstone
    # user returns within grace window: next session id continues at 2
    st.hasTimedOut = False
    assert run_fn(st, [(5000.0, 1.0)]) == []
    assert st.get[0] == 2
    # close it via a later event, emitted with id 2 (never a reuse of 1)
    closed = run_fn(st, [(9000.0, 1.0)])
    assert [r["session_id"] for r in closed] == [2]
    # tombstone timeout after flush: fully evicted
    st.hasTimedOut = True
    assert [r["session_id"] for r in run_fn(st, [])] == [3]  # flush open session 3
    st.hasTimedOut = True
    assert run_fn(st, []) == []
    assert st.removed and not st.exists


def test_sessionize_native_equals_batch(spark):
    """sessionize_native (session_window agg + per-user rank) was
    demoted from the driver-oracle registry in round 5 to fit the
    50-key check window; this equality against the oracle-gated
    lag+cumsum batch form is its standing correctness gate."""
    from gcp_dataengineering_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_native,
    )
    from gcp_dataengineering_spark.streaming.windowed import with_event_time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_event_time(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    batch = sorted(tuple(r) for r in sessionize_batch(ev).collect())
    native = sorted(tuple(r) for r in sessionize_native(ev).collect())
    assert len(batch) > 0
    assert native == batch


def test_dedup_stream_against_corpus_static_anti_join(spark, tmp_path):
    """Streaming incremental ingest: arriving docs whose fingerprint
    already exists in the STATIC corpus fp table are dropped by a
    stream-static anti join (no corpus-side state), intra-stream
    re-arrivals are dropped by the state store, and the emitted rows
    carry the fp column so the sink can extend the corpus table —
    results equal the batch dedup_exact_incremental survivors on the
    same data."""
    from gcp_dataengineering_spark.llm_ops.dedup import (
        dedup_exact,
        dedup_exact_incremental,
    )
    from gcp_dataengineering_spark.streaming.dedup import dedup_stream_against_corpus

    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    batch_rows = [
        (10, "alpha  beta   gamma"),   # normalizes to corpus doc 0 -> dropped
        (11, "eta theta iota"),        # novel -> kept
        (12, "eta theta iota"),        # intra-stream dup of 11 -> dropped
        (13, "kappa lambda mu"),       # novel -> kept
    ]
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    src = tmp_path / "stream_src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1.parquet"))

    corpus_fps = dedup_exact(corpus)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*.parquet"
    )
    name = f"ddc_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_stream_against_corpus(stream, corpus_fps)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT doc_id, fp FROM {name}").collect()
    finally:
        q.stop()
    got_ids = {r["doc_id"] for r in got}
    want_ids = {
        r["doc_id"]
        for r in dedup_exact_incremental(batch, corpus_fps).select("doc_id").collect()
    }
    assert got_ids == want_ids == {11, 13}
    # fp column rides along, non-null, distinct per survivor
    fps = {r["fp"] for r in got}
    assert len(fps) == 2 and all(fps)


def test_ingest_stream_equals_batch_composition(spark, tmp_path):
    """The composed streaming ingest (gate → scrub → lang → corpus
    dedup) admits exactly the rows the equivalent batch composition
    admits, with identical scrubbed text, language tags and
    fingerprints — stateless stages are expression-identical, so
    stream == batch row-for-row."""
    from gcp_dataengineering_spark.llm_ops.dedup import dedup_exact
    from gcp_dataengineering_spark.llm_ops.text import lang_id, quality_features, scrub_pii
    from gcp_dataengineering_spark.streaming.ingest import (
        default_quality_gate,
        ingest_stream,
    )

    filler = " ".join(f"word{i}" for i in range(30))
    rows = [
        (1, f"the and of a to {filler} call me at 555-123-4567 ok"),  # kept, phone scrubbed
        (2, "too short"),                                             # gated out
        (3, f"el la los de que {filler} correo bob@x.com aqui"),      # kept, email scrubbed
        (4, f"the and of a to {filler} call me at 555-123-4567 ok"),  # dup of 1 post-scrub
        (5, f"dup of corpus {filler} the and stays out"),             # corpus dup
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(100, f"dup of corpus {filler} the and stays out")], "doc_id long, text string"
    )
    corpus_fps = dedup_exact(corpus)

    src = tmp_path / "ingest_src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*.parquet"
    )
    name = f"ing_{uuid.uuid4().hex[:8]}"
    q = (
        ingest_stream(stream, corpus_fps)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        q.stop()

    # batch replay of the same stages
    feats = quality_features(batch)
    gated = feats.filter(default_quality_gate())
    scrubbed = (
        scrub_pii(gated, "text", out_col="_s")
        .withColumn("text", F.col("_s"))
        .drop("_s")
        .withColumn("lang_pred", lang_id(F.col("text")))
    )
    want = {r["doc_id"]: r for r in scrubbed.collect()}

    assert set(got) == {1, 3}  # 2 gated, 4 deduped vs 1, 5 deduped vs corpus
    for d in got:
        assert got[d]["text"] == want[d]["text"]
        assert got[d]["lang_pred"] == want[d]["lang_pred"]
        assert got[d]["fp"] is not None
    assert got[1]["n_phones"] == 1 and "<PHONE>" in got[1]["text"]
    assert got[3]["n_emails"] == 1 and "<EMAIL>" in got[3]["text"]
    assert got[3]["lang_pred"] == "es" and got[1]["lang_pred"] == "en"


def test_upsert_stream_maintains_latest_snapshot(spark, tmp_path):
    """Two arriving micro-batches of key updates → the snapshot holds
    exactly the latest version per key (idempotent merge: re-applying
    the last batch changes nothing)."""
    from gcp_dataengineering_spark.streaming.upsert import (
        upsert_batch_into_snapshot,
        upsert_stream,
    )

    snap = str(tmp_path / "snapshot")
    src = tmp_path / "upsert_src"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (1, 2, "a2")], "k long, ver long, payload string"
    )
    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))

    stream = spark.readStream.schema("k long, ver long, payload string").parquet(
        str(src) + "/*.parquet"
    )
    q = upsert_stream(stream, snap, ["k"], ["ver"],
                      checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        got1 = {r.k: (r.ver, r.payload) for r in spark.read.parquet(snap).collect()}
        assert got1 == {1: (2, "a2"), 2: (1, "b")}
        # second batch: update k=2, stale row for k=1 must NOT win
        b2 = spark.createDataFrame(
            [(2, 5, "b5"), (1, 1, "stale")], "k long, ver long, payload string"
        )
        b2.coalesce(1).write.parquet(str(src / "b2.parquet"))
        q.processAllAvailable()
        got2 = {r.k: (r.ver, r.payload) for r in spark.read.parquet(snap).collect()}
        assert got2 == {1: (2, "a2"), 2: (5, "b5")}
    finally:
        q.stop()

    # idempotence: re-merging the last batch by hand is a no-op
    upsert_batch_into_snapshot(b2, snap, ["k"], ["ver"])
    got3 = {r.k: (r.ver, r.payload) for r in spark.read.parquet(snap).collect()}
    assert got3 == got2


def test_time_bounded_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream time-range join: the SAME join code over two
    real event streams (views joined to the user's clicks within the
    next 30 min) produces exactly the batch result — and handcrafted
    boundary rows prove the closed range edges."""
    from gcp_dataengineering_spark.streaming.join import time_bounded_join

    # handcrafted edges: click exactly at +0 s and exactly at +600 s
    # are IN; +601 s is OUT; other users never match
    lrows = [(1, "2024-01-01 10:00:00", "v1"), (2, "2024-01-01 10:00:00", "v2")]
    rrows = [
        (1, "2024-01-01 10:00:00", "c0"),
        (1, "2024-01-01 10:10:00", "c600"),
        (1, "2024-01-01 10:10:01", "c601"),
        (3, "2024-01-01 10:00:30", "cx"),
    ]
    lb = spark.createDataFrame(lrows, "user_id long, vts string, vid string").withColumn(
        "vts", F.to_timestamp("vts")
    )
    rb = spark.createDataFrame(rrows, "user_id long, cts string, cid string").withColumn(
        "cts", F.to_timestamp("cts")
    )
    got = sorted(
        (r.vid, r.cid)
        for r in time_bounded_join(
            lb, rb, "user_id", "vts", "cts", before_s=0, after_s=600
        ).collect()
    )
    assert got == [("v1", "c0"), ("v1", "c600")]

    # stream==batch over the real events table
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    views_b = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("view_id")
    )
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    want = sorted(
        (r.view_id, r.click_id)
        for r in time_bounded_join(
            views_b, clicks_b, "user_id", "vts", "cts", before_s=0, after_s=1800
        ).collect()
    )
    assert want  # fixture must produce matches

    src = tmp_path / "ev_src"
    src.mkdir()
    ev.coalesce(1).write.parquet(str(src / "all.parquet"))
    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*.parquet")
    views_s = stream.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("view_id")
    )
    clicks_s = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    out = time_bounded_join(
        views_s, clicks_s, "user_id", "vts", "cts", before_s=0, after_s=1800
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tbj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tbj"))
        .start()
    )
    try:
        q.processAllAvailable()
        got_s = sorted(
            (r.view_id, r.click_id) for r in spark.sql("SELECT * FROM tbj").collect()
        )
    finally:
        q.stop()
    assert got_s == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="collision"):
        time_bounded_join(
            lb, rb.withColumnRenamed("cid", "vid"), "user_id", "vts", "cts"
        )


def _file_states(root):
    """path -> (size, mtime_ns) for every data file under root."""
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_bucketed_upsert_equals_full_rewrite_and_prunes(spark, tmp_path):
    """The bucket-pruned sink and the flat full-rewrite sink produce
    identical snapshots over the same batch sequence; a batch
    touching a few keys leaves every untouched bucket's files
    BYTE-IDENTICAL on disk (size+mtime receipt — the O(snapshot/
    n_buckets) claim is about what is rewritten, so the proof is
    what was NOT rewritten); and the manifest receipt shows the merge
    resolved current state from the touched buckets' files only."""
    from gcp_dataengineering_spark.streaming.upsert import (
        BUCKET_COL,
        _bucket_expr,
        read_bucketed_snapshot,
        upsert_batch_into_bucketed_snapshot,
        upsert_batch_into_snapshot,
    )

    from gcp_dataengineering_spark.streaming.upsert import _read_manifest

    flat = str(tmp_path / "flat")
    buck = str(tmp_path / "buck")
    n_buckets = 8
    # batch 1: 200 keys spread over all buckets
    b1 = spark.createDataFrame(
        [(i, 1, f"p{i}") for i in range(200)], "k long, ver long, payload string"
    )
    # batch 2: update 3 keys, insert 1, plus a stale row that must lose
    b2 = spark.createDataFrame(
        [(7, 9, "u7"), (8, 9, "u8"), (9, 9, "u9"), (1000, 1, "new"), (7, 2, "stale")],
        "k long, ver long, payload string",
    )
    for b in (b1, b2):
        upsert_batch_into_snapshot(b, flat, ["k"], ["ver"])
    upsert_batch_into_bucketed_snapshot(b1, buck, ["k"], ["ver"], n_buckets)

    before = _file_states(buck)
    m1 = _read_manifest(buck)
    upsert_batch_into_bucketed_snapshot(b2, buck, ["k"], ["ver"], n_buckets)
    after = _file_states(buck)
    m2 = _read_manifest(buck)

    # equality with the flat sink
    want = sorted(tuple(r) for r in spark.read.parquet(flat).collect())
    got = sorted(tuple(r) for r in read_bucketed_snapshot(spark, buck).collect())
    assert got == want

    # byte-identity of untouched buckets (manifest protocol: nothing
    # in an untouched bucket — or even a touched bucket's OLD files,
    # which are retired, not rewritten — may change on disk)
    touched = {
        r[0]
        for r in b2.select(_bucket_expr(["k"], n_buckets).alias("b"))
        .distinct()
        .collect()
    }
    assert 0 < len(touched) < n_buckets  # the fixture must leave some untouched
    for p, s in before.items():
        if p.startswith(f"{BUCKET_COL}="):
            assert after[p] == s, f"pre-existing file rewritten in place: {p}"
    # touched buckets got NEW live files; untouched manifest entries
    # carried over verbatim (pruning receipt: the merge resolves
    # current state from the manifest's touched-bucket files only)
    for b, fs in m1["buckets"].items():
        if int(b) in touched:
            assert m2["buckets"][b] != fs
            assert all(f in m2["retired"] for f in fs)
        else:
            assert m2["buckets"][b] == fs
    assert m2["generation"] == m1["generation"] + 1
    assert sorted(m2["retired"]) == sorted(
        f for b, fs in m1["buckets"].items() if int(b) in touched for f in fs
    )

    # layout contract: wrong n_buckets or keys must refuse to merge
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        upsert_batch_into_bucketed_snapshot(b2, buck, ["k"], ["ver"], 16)
    with _pytest.raises(ValueError, match="keys"):
        upsert_batch_into_bucketed_snapshot(
            b2.withColumnRenamed("k", "kk"), buck, ["kk"], ["ver"], n_buckets
        )


def test_upsert_layout_mode_guards(spark, tmp_path):
    """Mixing the two snapshot layouts must refuse loudly: the flat
    sink on a bucketed snapshot would flatten it (and poison later
    bucketed merges); the bucketed sink on a flat snapshot would
    produce a mixed directory that reads wrong."""
    import pytest as _pytest

    from gcp_dataengineering_spark.streaming.upsert import (
        upsert_batch_into_bucketed_snapshot,
        upsert_batch_into_snapshot,
    )

    b = spark.createDataFrame([(1, 1, "a")], "k long, ver long, payload string")

    bucketed = str(tmp_path / "bucketed")
    upsert_batch_into_bucketed_snapshot(b, bucketed, ["k"], ["ver"], 4)
    with _pytest.raises(ValueError, match="BUCKETED"):
        upsert_batch_into_snapshot(b, bucketed, ["k"], ["ver"])

    flat = str(tmp_path / "flat")
    upsert_batch_into_snapshot(b, flat, ["k"], ["ver"])
    with _pytest.raises(ValueError, match="flat"):
        upsert_batch_into_bucketed_snapshot(b, flat, ["k"], ["ver"], 4)


def test_bucketed_upsert_legacy_adoption_and_crash_recovery(spark, tmp_path):
    """A PRE-MANIFEST snapshot (two-rename era) torn mid-swap — one
    bucket dir under ._upsert_old and missing from the snapshot, plus
    an unfinished tmp — must be rolled back, adopted into a
    generation-0 manifest, and merged, losing nothing."""
    import os

    from gcp_dataengineering_spark.streaming.upsert import (
        _MANIFEST_FILE,
        BUCKET_COL,
        _read_manifest,
        read_bucketed_snapshot,
        upsert_batch_into_bucketed_snapshot,
    )

    buck = str(tmp_path / "snap")
    b1 = spark.createDataFrame(
        [(i, 1, f"p{i}") for i in range(50)], "k long, ver long, payload string"
    )
    upsert_batch_into_bucketed_snapshot(b1, buck, ["k"], ["ver"], 4)
    want = sorted(tuple(r) for r in read_bucketed_snapshot(spark, buck).collect())

    # rewind to the pre-manifest era: drop the manifest, then simulate
    # the old protocol's torn state (bucket moved to old, not replaced)
    os.remove(os.path.join(buck, _MANIFEST_FILE))
    old_root = buck + "._upsert_old"
    os.makedirs(old_root)
    victim = next(n for n in sorted(os.listdir(buck)) if n.startswith(BUCKET_COL))
    os.rename(os.path.join(buck, victim), os.path.join(old_root, victim))
    # plus an unfinished tmp write that must be discarded
    os.makedirs(buck + "._upsert_tmp/" + victim)

    b2 = spark.createDataFrame([(0, 2, "upd")], "k long, ver long, payload string")
    upsert_batch_into_bucketed_snapshot(b2, buck, ["k"], ["ver"], 4)
    got = {r.k: (r.ver, r.payload) for r in read_bucketed_snapshot(spark, buck).collect()}
    wantd = {r[0]: (r[1], r[2]) for r in want}
    wantd[0] = (2, "upd")
    assert got == wantd
    assert not os.path.exists(old_root)
    assert not os.path.exists(buck + "._upsert_tmp")
    assert _read_manifest(buck)["generation"] == 1  # adopted at 0, merged to 1


def test_bucketed_upsert_reader_isolation(spark, tmp_path):
    """The r7 sink documented that a reader overlapping a merge could
    see some buckets new and some old. The manifest protocol closes
    that: a reader that resolved the manifest at ANY instant reads a
    complete consistent snapshot — replaced files stay on disk (as
    manifest 'retired') until the NEXT merge, so mid-merge there is
    no moment where the old view is unreadable or mixed."""
    import os

    from gcp_dataengineering_spark.streaming.upsert import (
        _read_manifest,
        read_bucketed_snapshot,
        upsert_batch_into_bucketed_snapshot,
    )

    buck = str(tmp_path / "snap")
    b1 = spark.createDataFrame(
        [(i, 1, f"p{i}") for i in range(100)], "k long, ver long, payload string"
    )
    upsert_batch_into_bucketed_snapshot(b1, buck, ["k"], ["ver"], 8)
    # a reader resolves the generation-1 manifest...
    m1 = _read_manifest(buck)
    m1_files = [
        os.path.join(buck, f) for fs in m1["buckets"].values() for f in fs
    ]
    want_old = sorted(
        tuple(r) for r in spark.read.parquet(*m1_files).collect()
    )

    # ...then a merge publishes generation 2 while the reader is
    # "in flight": every gen-1 file must still be present and the
    # resolved view must still be the complete OLD snapshot
    b2 = spark.createDataFrame(
        [(3, 9, "u3"), (4, 9, "u4")], "k long, ver long, payload string"
    )
    upsert_batch_into_bucketed_snapshot(b2, buck, ["k"], ["ver"], 8)
    assert all(os.path.exists(p) for p in m1_files)
    got_old = sorted(tuple(r) for r in spark.read.parquet(*m1_files).collect())
    assert got_old == want_old  # old COMPLETE snapshot, no mix
    # a fresh resolve sees the new complete snapshot
    got_new = {
        r.k: r.payload for r in read_bucketed_snapshot(spark, buck).collect()
    }
    assert got_new[3] == "u3" and got_new[4] == "u4" and got_new[5] == "p5"

    # the THIRD merge garbage-collects gen 1's retirees (grace over)
    m2 = _read_manifest(buck)
    b3 = spark.createDataFrame([(3, 10, "v3")], "k long, ver long, payload string")
    upsert_batch_into_bucketed_snapshot(b3, buck, ["k"], ["ver"], 8)
    for f in m2["retired"]:
        assert not os.path.exists(os.path.join(buck, f)), f
    # while gen 2's own retirees (just replaced) still hold their grace
    m3 = _read_manifest(buck)
    assert m3["retired"]
    for f in m3["retired"]:
        assert os.path.exists(os.path.join(buck, f)), f


def test_bucketed_upsert_orphan_meta_reads_empty_and_is_swept(spark, tmp_path):
    """A crash after the meta write but before any data/manifest lands
    used to leave an unreadable directory that both sinks refused
    (ADVICE r7). Now: readers see an EMPTY snapshot with the recorded
    schema, the bucketed sink just proceeds, and the flat sink sweeps
    the orphan meta instead of demanding manual cleanup."""
    import os
    import shutil

    from gcp_dataengineering_spark.streaming.upsert import (
        _META_FILE,
        read_bucketed_snapshot,
        upsert_batch_into_bucketed_snapshot,
        upsert_batch_into_snapshot,
    )

    b = spark.createDataFrame([(1, 1, "a")], "k long, ver long, payload string")
    donor = str(tmp_path / "donor")
    upsert_batch_into_bucketed_snapshot(b, donor, ["k"], ["ver"], 4)

    def _orphan(name):
        d = str(tmp_path / name)
        os.makedirs(d)
        shutil.copy(os.path.join(donor, _META_FILE), os.path.join(d, _META_FILE))
        return d

    # reader: empty snapshot, correct schema
    df = read_bucketed_snapshot(spark, _orphan("o1"))
    assert df.count() == 0
    assert df.columns == ["k", "ver", "payload"]

    # bucketed sink: first merge proceeds and publishes normally
    o2 = _orphan("o2")
    upsert_batch_into_bucketed_snapshot(b, o2, ["k"], ["ver"], 4)
    assert [tuple(r) for r in read_bucketed_snapshot(spark, o2).collect()] == [
        (1, 1, "a")
    ]

    # flat sink: orphan meta swept, snapshot written flat
    o3 = _orphan("o3")
    upsert_batch_into_snapshot(b, o3, ["k"], ["ver"])
    assert not os.path.exists(os.path.join(o3, _META_FILE))
    assert [tuple(r) for r in spark.read.parquet(o3).collect()] == [(1, 1, "a")]


def test_bucketed_upsert_crash_before_publish_never_blesses_orphans(
    spark, tmp_path, monkeypatch
):
    """r8 review finding: a crash between staging part files and the
    manifest publish must leave the staged files as ORPHANS — never
    visible to readers, never adopted as live by a later merge. The
    fix pins generation 0 (fresh or adopted) before any data lands."""
    import os

    from gcp_dataengineering_spark.streaming import upsert as U

    buck = str(tmp_path / "snap")
    b1 = spark.createDataFrame(
        [(i, 1, f"p{i}") for i in range(40)], "k long, ver long, payload string"
    )
    U.upsert_batch_into_bucketed_snapshot(b1, buck, ["k"], ["ver"], 4)
    # rewind to the legacy era (no manifest), as the worst case
    os.remove(os.path.join(buck, U._MANIFEST_FILE))
    want = {(r.k, r.ver, r.payload) for r in U.read_bucketed_snapshot(spark, buck).collect()}

    # crash injection: adoption publish (1st call) succeeds, the
    # post-merge publish (2nd call) dies after files are staged
    real_write = U._write_manifest
    calls = {"n": 0}

    def dying_write(snapshot_dir, manifest):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash before manifest publish")
        real_write(snapshot_dir, manifest)

    monkeypatch.setattr(U, "_write_manifest", dying_write)
    b2 = spark.createDataFrame([(0, 2, "upd")], "k long, ver long, payload string")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        U.upsert_batch_into_bucketed_snapshot(b2, buck, ["k"], ["ver"], 4)
    monkeypatch.setattr(U, "_write_manifest", real_write)

    # the reader sees EXACTLY the pre-crash snapshot: no duplicate
    # keys from the staged-but-unpublished files
    got = [
        (r.k, r.ver, r.payload)
        for r in U.read_bucketed_snapshot(spark, buck).collect()
    ]
    assert len(got) == len(want) and set(got) == want

    # the next merge completes normally and sweeps the orphans: one
    # live file set, the update applied exactly once
    U.upsert_batch_into_bucketed_snapshot(b2, buck, ["k"], ["ver"], 4)
    final = {r.k: (r.ver, r.payload) for r in U.read_bucketed_snapshot(spark, buck).collect()}
    assert final[0] == (2, "upd") and len(final) == 40
    m = U._read_manifest(buck)
    live = {f for fs in m["buckets"].values() for f in fs}
    on_disk = {
        os.path.join(d, f)
        for d in U._bucket_dirs(buck)
        for f in os.listdir(os.path.join(buck, d))
        if f.endswith(".parquet")
    }
    assert on_disk - live == set(m["retired"])  # orphans gone


def test_bucketed_upsert_meta_publish_is_atomic(spark, tmp_path):
    """r8 ADVICE (medium): _upsert_meta.json is load-bearing (its
    recorded schema drives _empty_from_meta, and pre-r8 snapshots are
    upgraded by rewriting it), so it must publish with the same
    write-aside + os.replace discipline as the manifest. Receipts:
    (a) a stray half-written meta .tmp (crash between write-aside and
    rename) is invisible — later merges and reads work off the real
    meta and never parse the .tmp; (b) the published meta is valid
    JSON with the full recorded contract after every merge."""
    import json as _json
    import os as _os

    from gcp_dataengineering_spark.streaming.upsert import (
        _META_FILE,
        read_bucketed_snapshot,
        upsert_batch_into_bucketed_snapshot,
    )

    buck = str(tmp_path / "buck")
    b1 = spark.createDataFrame(
        [(i, 1, f"p{i}") for i in range(50)], "k long, ver long, payload string"
    )
    upsert_batch_into_bucketed_snapshot(b1, buck, ["k"], ["ver"], 4)
    meta_path = _os.path.join(buck, _META_FILE)
    with open(meta_path) as fh:
        meta = _json.load(fh)  # valid JSON, not truncated
    assert meta["n_buckets"] == 4 and meta["keys"] == ["k"] and "schema" in meta

    # simulate a crash mid-write-aside: garbage .tmp next to the meta
    with open(meta_path + ".tmp", "w") as fh:
        fh.write('{"n_buckets": 4, "keys": ["k"], "sch')  # truncated JSON
    b2 = spark.createDataFrame(
        [(7, 9, "u7"), (999, 1, "new")], "k long, ver long, payload string"
    )
    upsert_batch_into_bucketed_snapshot(b2, buck, ["k"], ["ver"], 4)
    got = {r.k: (r.ver, r.payload) for r in read_bucketed_snapshot(spark, buck).collect()}
    assert got[7] == (9, "u7") and got[999] == (1, "new") and len(got) == 51
    with open(meta_path) as fh:
        assert _json.load(fh)["n_buckets"] == 4  # real meta untouched


def test_ingest_stream_model_gate_parity_with_batch(spark, tmp_path):
    """r12: the learned quality gate composes into the streaming
    ingest as a stateless static-broadcast row map — the stream
    admits exactly the rows the batch nb_quality_gate admits, with
    identical scores, and the spam-vocabulary rows the heuristic
    gate cannot see are dropped online."""
    from gcp_dataengineering_spark.llm_ops.dedup import dedup_exact
    from gcp_dataengineering_spark.llm_ops.quality_model import (
        nb_quality_gate,
        nb_train,
    )
    from gcp_dataengineering_spark.streaming.ingest import ingest_stream

    hamv = "analysis research evidence chapter history science".split()
    spamv = "casino jackpot lottery unsubscribe winner promo".split()
    filler = "the and of a to " + " ".join(f"word{i}" for i in range(25))

    def text(i, vocab):
        return f"{filler} u{i} " + " ".join(vocab[j % len(vocab)] for j in range(20))

    labeled = spark.createDataFrame(
        [(text(900 + i, hamv), 1) for i in range(10)]
        + [(text(950 + i, spamv), 0) for i in range(10)],
        "text string, label int",
    )
    model_rows = nb_train(labeled, num_buckets=256).collect()
    model = spark.createDataFrame(
        model_rows, "bucket long, c1 long, c0 long, weight long, prior long"
    )
    rows = [(i, text(i, hamv)) for i in range(4)] + [
        (100 + i, text(50 + i, spamv)) for i in range(4)
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    corpus_fps = dedup_exact(
        spark.createDataFrame([(999, "unrelated corpus doc")], "doc_id long, text string")
    )

    src = tmp_path / "nbq_src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*.parquet"
    )
    name = f"nbq_{uuid.uuid4().hex[:8]}"
    q = (
        ingest_stream(stream, corpus_fps, quality_model=model)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.doc_id: r.nbq_score
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()
    assert set(got) == {0, 1, 2, 3}  # spam rows (100+) never admitted
    # stream == batch: the same gate over the same rows, same scores
    want = {
        r.doc_id: r.nbq_score
        for r in nb_quality_gate(batch, model).collect()
    }
    assert got == want


def test_semantic_dedup_stream_single_batch_matches_batch_twin(spark, tmp_path):
    """r14 (r13 verdict item 2): the streaming semantic gate over the
    real fixture corpus in ONE micro-batch admits exactly the batch
    twin's keepers — within a batch the resolution IS
    embed.semantic_dedup (same embeddings, same LSH tables, same
    integer-cosine threshold, same CC min-id keepers)."""
    import uuid

    from gcp_dataengineering_spark.llm_ops.embed import semantic_dedup
    from gcp_dataengineering_spark.streaming.semantic import (
        semantic_dedup_stream,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expect = {
        r.doc_id
        for r in semantic_dedup(
            docs, cos_num=95, n_planes=8, n_tables=6
        ).filter(F.col("doc_id") == F.col("group_id")).collect()
    }

    schema = docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    out = str(tmp_path / "out")
    q = semantic_dedup_stream(
        stream,
        str(tmp_path / "store"),
        out,
        checkpoint_dir=str(tmp_path / f"ckpt_{uuid.uuid4().hex[:8]}"),
        cos_num=95, n_planes=8, n_tables=6,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == expect
    assert len(got) < docs.count()  # the fixture does contain dups


def _clique_corpus_rows():
    """Three near-identical paraphrase cliques + singletons, members
    spread across arrival batches; id order == arrival order."""
    base_a = ("the committee approved the annual budget for road "
              "maintenance and allocated additional funds for bridge "
              "repairs across the northern districts this season")
    base_b = ("astronomers observed a distant supernova whose light "
              "curve suggested an unusually massive progenitor star "
              "collapsing under its own gravity far away")
    base_c = ("the recipe calls for fresh basil ripe tomatoes olive "
              "oil and a pinch of sea salt layered over thin slices "
              "of mozzarella cheese before serving")
    uniq1 = ("quarterly revenue grew modestly while operating margins "
             "compressed due to higher logistics costs and currency "
             "headwinds in overseas markets during the period")
    uniq2 = ("migratory birds follow magnetic field lines and stellar "
             "cues when crossing continents twice a year in enormous "
             "flocks that span entire horizons")
    # batch files: [0] ids 1-4, [1] ids 11-14, [2] ids 21-24
    return [
        [(1, base_a + " version alpha"), (2, base_a + " version beta"),
         (3, base_b + " take one"), (4, uniq1)],
        [(11, base_a + " version gamma"), (12, base_b + " take two"),
         (13, base_c + " variant x"), (14, uniq2)],
        [(21, base_b + " take three"), (22, base_c + " variant y"),
         (23, base_c + " variant z"),
         (24, "")],  # zero-vector doc: admitted, never stored
    ]


def test_semantic_dedup_stream_multibatch_matches_batch_twin(spark, tmp_path):
    """Clique clusters arriving in id order across THREE micro-batches:
    greedy first-arrival resolution equals the batch twin's CC keepers
    (the module's documented agreement case), including a cluster
    whose members span all three batches and a zero-vector doc that
    is admitted unconditionally."""
    import os
    import time
    import uuid

    from gcp_dataengineering_spark.llm_ops.embed import semantic_dedup
    from gcp_dataengineering_spark.streaming.semantic import (
        semantic_dedup_stream,
    )

    batches = _clique_corpus_rows()
    all_rows = [r for b in batches for r in b]
    docs = spark.createDataFrame(all_rows, "doc_id long, text string")

    groups = semantic_dedup(docs, cos_num=92, n_planes=8, n_tables=8)
    labels = {r.doc_id: r.group_id for r in groups.collect()}
    # the planted structure actually holds: three cliques + singles
    assert labels[2] == 1 and labels[11] == 1
    assert labels[12] == 3 and labels[21] == 3
    assert labels[22] == 13 and labels[23] == 13
    for d in (4, 14, 24):
        assert labels[d] == d
    expect = {d for d, g in labels.items() if d == g}

    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
        # file-source ordering: distinct mtimes, oldest first
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    out = str(tmp_path / "out")
    q = semantic_dedup_stream(
        stream,
        str(tmp_path / "store"),
        out,
        checkpoint_dir=str(tmp_path / f"ckpt_{uuid.uuid4().hex[:8]}"),
        cos_num=92, n_planes=8, n_tables=8,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == expect
    # the zero-vector doc was admitted but never stored
    from gcp_dataengineering_spark.streaming.semantic import (
        read_semantic_store,
    )

    store_docs, store_buckets, meta = read_semantic_store(
        spark, str(tmp_path / "store")
    )
    assert 24 in got
    assert store_docs.filter(F.col("_sid") == 24).count() == 0
    # dropped docs ARE stored (the reachable-set rule)
    assert store_docs.filter(F.col("_sid") == 2).count() == 1
    # r15 segment layout: one immutable segment per non-empty batch,
    # write amplification O(batch) — three batches, three segments
    assert len(meta["segments"]) == 3


def test_semantic_store_segments_immutable_and_grace_gc(spark, tmp_path):
    """r15 (r14 verdict item 1): the store is append-only immutable
    segments under a manifest — a micro-batch writes O(batch) and
    NEVER rewrites prior state. Batch N+1 leaves batch N's segment
    files byte-identical on disk; expired segments leave the
    manifest first (logical eviction — readers keep one merge cycle
    of grace, upsert.py's rule) and their directories are deleted by
    the NEXT batch's GC."""
    import hashlib
    import os

    from gcp_dataengineering_spark.streaming.semantic import (
        read_semantic_store,
        semantic_dedup_batch,
    )

    store = str(tmp_path / "store")
    t1 = ("completely distinct paragraph about alpine railway "
          "engineering and tunnel ventilation shaft design standards")
    t2 = ("another unrelated text on deep sea hydrothermal vent "
          "ecosystems and chemosynthetic bacterial mat communities")
    t3 = ("third standalone musing on renaissance fresco restoration "
          "techniques and mineral pigment chemistry in aged plaster")

    def mk(doc_id, text, ep):
        return spark.createDataFrame(
            [(doc_id, text, ep)], "doc_id long, text string, ep double"
        ).withColumn("ets", F.col("ep").cast("timestamp"))

    kw = dict(
        cos_num=92, n_planes=8, n_tables=6,
        event_time_col="ets", watermark="100 seconds",
    )

    def snap(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[p] = hashlib.sha256(fh.read()).hexdigest()
        return out

    semantic_dedup_batch(mk(1, t1, 1000.0), store, **kw)
    _, _, m1 = read_semantic_store(spark, store)
    assert len(m1["segments"]) == 1
    seg1_dir = os.path.join(store, m1["segments"][0]["dir"])
    seg1_before = snap(seg1_dir)
    assert seg1_before

    semantic_dedup_batch(mk(2, t2, 1010.0), store, **kw)
    assert snap(seg1_dir) == seg1_before  # untouched, byte-identical
    _, _, m2 = read_semantic_store(spark, store)
    assert len(m2["segments"]) == 2

    # a far-future batch ages both old segments past the watermark:
    # they leave the manifest but stay on disk one merge cycle
    semantic_dedup_batch(mk(3, t3, 5000.0), store, **kw)
    _, _, m3 = read_semantic_store(spark, store)
    old_dirs = {s["dir"] for s in m2["segments"]}
    assert {s["dir"] for s in m3["segments"]} & old_dirs == set()
    assert set(m3["retired"]) == old_dirs
    for d in old_dirs:
        assert os.path.isdir(os.path.join(store, d))  # reader grace
    semantic_dedup_batch(mk(4, t1 + " again", 5010.0), store, **kw)
    for d in old_dirs:
        assert not os.path.exists(os.path.join(store, d))  # GC'd


def test_semantic_store_null_event_time_full_window(spark, tmp_path):
    """ADVICE r14: rows with a NULL event time used to evict in the
    same batch they arrived (admitted but never effectively stored),
    so later re-phrasings were never caught. They are now stored
    under the batch's high water mark — a full watermark window of
    state — and only rows seen before ANY event time existed age out
    when a high water mark first appears."""
    from gcp_dataengineering_spark.streaming.semantic import (
        semantic_dedup_batch,
    )

    base_x = ("a very long paragraph about municipal water treatment "
              "plants and their seasonal maintenance schedules including "
              "filtration membrane replacement procedures")
    base_y = ("entirely unrelated musings on medieval manuscript "
              "illumination techniques using gold leaf and crushed "
              "lapis lazuli pigments prepared by monks")

    def mk(doc_id, text, ep):
        return spark.createDataFrame(
            [(doc_id, text, ep)], "doc_id long, text string, ep double"
        ).withColumn("ets", F.col("ep").cast("timestamp"))

    kw = dict(
        cos_num=92, n_planes=8, n_tables=6,
        event_time_col="ets", watermark="100 seconds",
    )

    store = str(tmp_path / "store")
    assert semantic_dedup_batch(mk(1, base_x + " one", 1000.0), store, **kw).count() == 1
    # NULL event time: admitted, stored under hwm=1000
    assert semantic_dedup_batch(mk(2, base_y + " one", None), store, **kw).count() == 1
    # a re-phrase arriving within the window IS caught (the r14 gap)
    assert semantic_dedup_batch(mk(3, base_y + " two", 1050.0), store, **kw).count() == 0
    # a far-future base_x re-phrase still matches doc 1 (the read
    # filter uses the PRE-batch high water mark) but advances the
    # mark to 2000, aging out docs 1-3...
    assert semantic_dedup_batch(mk(4, base_x + " two", 2000.0), store, **kw).count() == 0
    # ... so the NULL-epoch doc's cluster ages out with the window
    # like any on-time row
    assert semantic_dedup_batch(mk(5, base_y + " three", 2010.0), store, **kw).count() == 1

    # the documented corner: rows seen before ANY event time existed
    # stay NULL-epoch and age out as soon as a high water mark appears
    store2 = str(tmp_path / "store2")
    assert semantic_dedup_batch(mk(1, base_x + " one", None), store2, **kw).count() == 1
    # hwm appears (doc 2 unrelated); doc 1's all-NULL segment expires
    assert semantic_dedup_batch(mk(2, base_y + " one", 5000.0), store2, **kw).count() == 1
    assert semantic_dedup_batch(mk(3, base_x + " two", 5010.0), store2, **kw).count() == 1


def test_semantic_store_legacy_migration(spark, tmp_path):
    """A pre-r15 two-rename store (whole-table docs/ + buckets/ dirs)
    reads as-is through read_semantic_store (read-only adaptation)
    and is migrated once by the next write, preserving its state:
    the dup decision against legacy-stored docs is unchanged."""
    import json
    import os

    from gcp_dataengineering_spark.streaming.semantic import (
        read_semantic_store,
        semantic_dedup_batch,
    )

    base = ("a very long paragraph about municipal water treatment "
            "plants and their seasonal maintenance schedules including "
            "filtration membrane replacement procedures")

    def mk(doc_id, text, ep):
        return spark.createDataFrame(
            [(doc_id, text, ep)], "doc_id long, text string, ep double"
        ).withColumn("ets", F.col("ep").cast("timestamp"))

    kw = dict(
        cos_num=92, n_planes=8, n_tables=6,
        event_time_col="ets", watermark="100 seconds",
    )

    # build state with the current code, then down-convert it to the
    # legacy on-disk layout (schemas match the pre-r15 store exactly)
    seed_store = str(tmp_path / "seed")
    semantic_dedup_batch(mk(1, base + " one", 1000.0), seed_store, **kw)
    docs, buckets, _ = read_semantic_store(spark, seed_store)
    legacy = str(tmp_path / "legacy")
    os.makedirs(legacy)
    docs.write.parquet(os.path.join(legacy, "docs"))
    buckets.drop("_sepoch").write.parquet(os.path.join(legacy, "buckets"))
    with open(os.path.join(legacy, "_semantic_store_meta.json"), "w") as fh:
        json.dump({"max_event_epoch": 1000.0}, fh)

    # read-only adaptation: no rewrite, buckets gain _sepoch in memory
    ld, lb, lm = read_semantic_store(spark, legacy)
    assert "segments" not in lm
    assert ld.count() == 1 and "_sepoch" in lb.columns
    assert os.path.isdir(os.path.join(legacy, "docs"))

    # the next write migrates once, and the dup decision against the
    # legacy-stored doc is preserved
    assert semantic_dedup_batch(mk(2, base + " two", 1030.0), legacy, **kw).count() == 0
    _, _, m = read_semantic_store(spark, legacy)
    assert len(m["segments"]) == 2  # migrated seed + the new batch
    assert not os.path.isdir(os.path.join(legacy, "docs"))
    assert m["max_event_epoch"] == 1030.0


def test_compact_semantic_store_reconciles_chain_divergence(spark, tmp_path):
    """r15 (r14 verdict item 3): the documented greedy-vs-batch
    divergence — a CHAIN component whose middle link arrives in a
    later batch — is reconciled by compact_semantic_store: the
    returned frame equals embed.semantic_dedup's resolution over all
    seen docs EXACTLY, and the physical layout compacts to one
    segment while the gate keeps working."""
    import os

    from gcp_dataengineering_spark.llm_ops.embed import semantic_dedup
    from gcp_dataengineering_spark.streaming.semantic import (
        compact_semantic_store,
        read_semantic_store,
        semantic_dedup_batch,
    )

    # A~B and B~C clear cos >= 0.92; A~C does not (verified via the
    # engine's own embedding): one chain component, keeper min id 1
    A = ("municipal water treatment plants require seasonal maintenance "
         "schedules including filtration membrane replacement procedures "
         "and careful monitoring of chemical dosing systems across every "
         "stage of the purification process")
    B = ("municipal water treatment facilities require quarterly upkeep "
         "schedules including filtration membrane replacement procedures "
         "and careful monitoring of chemical dosing systems across every "
         "stage of the purification process")
    C = ("municipal water treatment facilities require quarterly upkeep "
         "schedules including sand filter cartridge renewal operations "
         "and careful monitoring of chemical dosing systems across every "
         "stage of the purification process")
    kw = dict(cos_num=92, n_planes=8, n_tables=8)

    twin = {
        r.doc_id: r.group_id
        for r in semantic_dedup(
            spark.createDataFrame(
                [(1, A), (2, B), (3, C)], "doc_id long, text string"
            ),
            **kw,
        ).collect()
    }
    assert twin == {1: 1, 2: 1, 3: 1}  # the planted chain holds

    store = str(tmp_path / "store")
    # batch 1: the chain's ENDS arrive together — no pair (A !~ C),
    # both admitted (this is the stream's extra-member divergence)
    b1 = spark.createDataFrame([(1, A), (3, C)], "doc_id long, text string")
    assert {r.doc_id for r in semantic_dedup_batch(b1, store, **kw).collect()} == {1, 3}
    # batch 2: the middle link arrives, anchors to both, dropped
    b2 = spark.createDataFrame([(2, B)], "doc_id long, text string")
    assert semantic_dedup_batch(b2, store, **kw).count() == 0
    # the stream kept {1, 3}; the batch twin keeps only {1}

    got = {
        r.doc_id: (r.group_id, r.keep)
        for r in compact_semantic_store(spark, store).collect()
    }
    assert got == {d: (g, d == g) for d, g in twin.items()}

    # physical compaction: one segment, prior ones retired (grace),
    # GC'd by the next write — and the gate still works on the
    # compacted store (a re-phrasing of the chain is still caught)
    _, _, m = read_semantic_store(spark, store)
    assert len(m["segments"]) == 1
    for d in m["retired"]:
        assert os.path.isdir(os.path.join(store, d))
    b3 = spark.createDataFrame([(9, B)], "doc_id long, text string")
    assert semantic_dedup_batch(b3, store, **kw).count() == 0
    for d in m["retired"]:
        assert not os.path.exists(os.path.join(store, d))

    # empty store: empty resolution frame, correct schema
    empty = compact_semantic_store(spark, str(tmp_path / "none"), cos_num=92, cos_den=100)
    assert empty.columns == ["doc_id", "group_id", "keep"]
    assert empty.count() == 0


def test_semantic_dedup_batch_watermark_evicts_state(spark, tmp_path):
    """Event-time watermark bounds the store: a duplicate arriving
    within the window is dropped; after the high water mark moves
    past the window, the old state is evicted and the same content
    is re-admitted (the documented bounded-state trade-off — exactly
    dropDuplicatesWithinWatermark's). Replaying an already-stored
    batch admits nothing (the store is the dedup ledger)."""
    from gcp_dataengineering_spark.streaming.semantic import (
        read_semantic_store,
        semantic_dedup_batch,
    )

    store = str(tmp_path / "store")
    base = ("a very long paragraph about municipal water treatment "
            "plants and their seasonal maintenance schedules including "
            "filtration membrane replacement procedures")
    other = ("entirely unrelated musings on medieval manuscript "
             "illumination techniques using gold leaf and crushed "
             "lapis lazuli pigments prepared by monks")

    def mk(doc_id, text, epoch):
        return spark.createDataFrame(
            [(doc_id, text, epoch)], "doc_id long, text string, ep double"
        ).withColumn("ets", F.col("ep").cast("timestamp"))

    kw = dict(
        cos_num=95, n_planes=8, n_tables=6,
        event_time_col="ets", watermark="100 seconds",
    )
    a1 = semantic_dedup_batch(mk(1, base + " one", 1000.0), store, **kw)
    assert [r.doc_id for r in a1.collect()] == [1]
    # dup within the watermark window -> dropped
    a2 = semantic_dedup_batch(mk(2, base + " two", 1030.0), store, **kw)
    assert a2.count() == 0
    # unrelated doc far in the future advances the high water mark;
    # docs 1 and 2 age out of the store
    a3 = semantic_dedup_batch(mk(3, other, 2000.0), store, **kw)
    assert [r.doc_id for r in a3.collect()] == [3]
    docs_df, buckets_df, meta = read_semantic_store(spark, store)
    assert {r._sid for r in docs_df.collect()} == {3}
    assert {r._sid for r in buckets_df.select("_sid").distinct().collect()} == {3}
    assert meta["max_event_epoch"] == 2000.0
    # same content re-arrives after eviction -> re-admitted
    a4 = semantic_dedup_batch(mk(4, base + " three", 2010.0), store, **kw)
    assert [r.doc_id for r in a4.collect()] == [4]
    # at-least-once replay: the batch's docs are already in the store,
    # so a replay self-matches and admits nothing new
    a4r = semantic_dedup_batch(mk(4, base + " three", 2010.0), store, **kw)
    assert a4r.count() == 0


def test_ingest_stream_semantic_composed_gate(spark, tmp_path):
    """r14: the composed online gate WITH the semantic stage
    (ingest_stream_semantic) — heuristic gate, exact corpus dedup,
    and the SemDeDup stage all fire in one running query: a too-short
    doc is gated, an exact corpus dup is dropped by the fingerprint
    stage, a RE-PHRASING of an admitted doc (different fingerprint,
    cos ≥ threshold) is dropped by the semantic stage, and the
    distinct survivors land in the output parquet."""
    import uuid as _uuid

    from gcp_dataengineering_spark.llm_ops.dedup import dedup_exact
    from gcp_dataengineering_spark.streaming.ingest import (
        ingest_stream_semantic,
    )

    filler = " ".join(f"word{i}" for i in range(30))
    filler2 = " ".join(f"item{i} thing{i}" for i in range(15))
    base = f"the and of a to {filler} morning briefing covered harbor traffic"
    rows = [
        (1, base + " in detail today"),          # kept
        (2, "too short"),                         # heuristic gate
        (3, base + " in detail tomorrow"),        # semantic re-phrase of 1
        (5, f"dup of corpus {filler2} the and stays out"),  # exact corpus dup
        (6, f"el la los de que {filler2} completely separate topic here"),  # kept
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(100, f"dup of corpus {filler2} the and stays out")],
        "doc_id long, text string",
    )
    corpus_fps = dedup_exact(corpus)

    src = tmp_path / "src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*.parquet"
    )
    out = str(tmp_path / "out")
    q = ingest_stream_semantic(
        stream,
        corpus_fps,
        str(tmp_path / "store"),
        out,
        checkpoint_dir=str(tmp_path / f"ckpt_{_uuid.uuid4().hex[:8]}"),
        semantic_cos=90,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert {r.doc_id for r in got.collect()} == {1, 6}
    # the ingest chain's columns ride through the semantic sink
    assert {"fp", "lang_pred"} <= set(got.columns)


def test_semantic_store_auto_compaction_policy(spark, tmp_path):
    """r16 (r15 verdict item 4): auto_compact_segments=K records a
    compaction policy in the store meta; whenever a publish leaves
    more than K live segments the batch hook folds the layout to one
    segment (physical-only — resolve=False). The policy persists
    across batches without re-passing the parameter; admission
    decisions are byte-identical to an un-compacted twin store; the
    folded store's live content equals the twin's."""
    import os

    from gcp_dataengineering_spark.streaming.semantic import (
        read_semantic_store,
        semantic_dedup_batch,
    )

    auto = str(tmp_path / "auto")
    plain = str(tmp_path / "plain")
    texts = [
        "alpine railway engineering and tunnel ventilation design",
        "deep sea hydrothermal vent ecosystems and bacterial mats",
        "renaissance fresco restoration and mineral pigment chemistry",
        "container orchestration scheduling under memory pressure",
        "migratory songbird navigation by stellar and magnetic cues",
        "alpine railway engineering and tunnel ventilation design",  # dup of 0
        "fermentation kinetics in sourdough starter maintenance",
        "deep sea hydrothermal vent ecosystems and bacterial mats",  # dup of 1
    ]

    def mk(i):
        return spark.createDataFrame(
            [(i, texts[i], 1000.0 + i)], "doc_id long, text string, ep double"
        ).withColumn("ets", F.col("ep").cast("timestamp"))

    kw = dict(cos_num=92, n_planes=8, n_tables=6,
              event_time_col="ets", watermark="1000 seconds")

    admitted_auto, admitted_plain = [], []
    for i in range(len(texts)):
        # policy passed ONCE (first batch), inherited from the meta after
        a_kw = dict(kw, auto_compact_segments=3) if i == 0 else kw
        admitted_auto.append(
            {r.doc_id for r in semantic_dedup_batch(mk(i), auto, **a_kw).collect()}
        )
        admitted_plain.append(
            {r.doc_id for r in semantic_dedup_batch(mk(i), plain, **kw).collect()}
        )
        _, _, m = read_semantic_store(spark, auto)
        assert len(m["segments"]) <= 3 + 1, (i, m["segments"])
        assert m.get("auto_compact_segments") == 3

    # identical admission decisions, batch by batch
    assert admitted_auto == admitted_plain
    # the planted dups were rejected somewhere
    assert 5 not in set().union(*admitted_auto)
    assert 7 not in set().union(*admitted_auto)

    # folded store content equals the twin's (same _sids, same buckets)
    d_a, b_a, m_a = read_semantic_store(spark, auto)
    d_p, b_p, m_p = read_semantic_store(spark, plain)
    assert {r._sid for r in d_a.collect()} == {r._sid for r in d_p.collect()}
    assert (
        {(r._sid, r.tbl, r.bucket) for r in b_a.collect()}
        == {(r._sid, r.tbl, r.bucket) for r in b_p.collect()}
    )
    # the un-policed twin kept one segment per batch; the auto store
    # stayed folded
    assert len(m_p["segments"]) == len(texts)
    assert len(m_a["segments"]) <= 4
    # clearing the policy: pass 0
    semantic_dedup_batch(
        mk(0).withColumn("doc_id", F.lit(100)), auto,
        auto_compact_segments=0, **kw,
    )
    _, _, m = read_semantic_store(spark, auto)
    assert "auto_compact_segments" not in m
    # retired dirs from the last fold keep reader grace on disk
    for d in m.get("retired", []):
        assert os.path.isdir(os.path.join(auto, d))


def test_auto_compaction_preserves_same_turn_watermark_retirees(spark, tmp_path):
    """r17 (ADVICE r16): when ONE publish both retires segments via
    watermark expiry and crosses the auto-compaction threshold, the
    same-turn compaction hook must NOT sweep the just-retired dirs —
    they keep the one-merge reader grace until the START of the next
    batch (gc=False on the hook's compact call)."""
    import os

    from gcp_dataengineering_spark.streaming.semantic import (
        _read_meta,
        read_semantic_store,
        semantic_dedup_batch,
    )

    store = str(tmp_path / "grace")
    texts = [
        "glacier mass balance monitoring with terrestrial radar",
        "polyphonic renaissance choral tuning systems in practice",
        "asynchronous replication lag in geo distributed databases",
        "coastal dune vegetation succession after storm overwash",
        "thermoacoustic refrigeration without moving mechanical parts",
    ]

    def mk(i, ep):
        return spark.createDataFrame(
            [(i, texts[i], float(ep))], "doc_id long, text string, ep double"
        ).withColumn("ets", F.col("ep").cast("timestamp"))

    kw = dict(cos_num=92, n_planes=8, n_tables=6,
              event_time_col="ets", watermark="36 seconds")
    # three policy-free batches: segments accumulate (epochs 0, 5, 10)
    for i, ep in enumerate([0, 5, 10]):
        semantic_dedup_batch(mk(i, ep), store, **kw)
    meta = _read_meta(store)
    assert len(meta["segments"]) == 3
    s0_dir = meta["segments"][0]["dir"]

    # batch 4 (epoch 40, cutoff 4): retires s0 by watermark AND, with
    # the policy enabled this very batch, leaves 3 live > K=2 — the
    # compaction hook fires in the same foreachBatch turn
    semantic_dedup_batch(mk(3, 40), store, auto_compact_segments=2, **kw)
    meta = _read_meta(store)
    assert len(meta["segments"]) == 1  # folded
    assert s0_dir not in {s["dir"] for s in meta["segments"]}
    assert s0_dir not in meta["retired"]  # the fold's own retirees replaced it
    # THE fix: the watermark retiree survives the same-turn compaction
    assert os.path.isdir(os.path.join(store, s0_dir))
    # the fold's retirees keep grace too
    for d in meta["retired"]:
        assert os.path.isdir(os.path.join(store, d))

    # the NEXT batch's start-of-batch GC collects it (documented timing)
    semantic_dedup_batch(mk(4, 41), store, **kw)
    assert not os.path.isdir(os.path.join(store, s0_dir))
    # store still reads coherently
    d, b, m = read_semantic_store(spark, store)
    assert d is not None and d.count() >= 1


def test_ingest_stream_semantic_perplexity_gate(spark, tmp_path):
    """r17 (r16 verdict item 3): the CCNet-style LM gate runs ONLINE
    inside the composed semantic ingest — a persisted reference model
    (trigram KN, the deepest form) is loaded once, every micro-batch
    is scored in the foreachBatch turn, and a planted gibberish doc
    that PASSES the heuristic gate (stopwords/length/punct all fine)
    is dropped before semantic admission. Stream gate decisions are
    pinned EQUAL to batch lm_score over the same rows."""
    import uuid as _uuid

    from gcp_dataengineering_spark.llm_ops.dedup import dedup_exact
    from gcp_dataengineering_spark.llm_ops.ngram_lm import (
        lm_load,
        lm_score,
        perplexity_gate,
        trigram_lm_fit,
        lm_save,
    )
    from gcp_dataengineering_spark.streaming.ingest import ingest_stream_semantic

    fluent = ("the quick brown fox jumps over the lazy dog and then it "
              "ran to the house of the cat in the morning")
    ref = spark.createDataFrame(
        [(1000 + i, fluent) for i in range(10)], "doc_id long, text string"
    )
    model_dir = str(tmp_path / "lm")
    lm_save(trigram_lm_fit(ref, smoothing="kn"), model_dir)

    filler = " ".join(f"word{i}" for i in range(25))
    filler_b = " ".join(f"topic{i} item{i}" for i in range(13))
    gib = " ".join(f"zq{j}w of vb{j}k to qx{j}p" for j in range(12)) + "."
    rows = [
        (1, f"the quick brown fox jumps over the lazy dog and then {filler} ."),
        (2, gib),                                   # heuristics pass, LM kills
        (3, f"it ran to the house of the cat in the morning {filler_b} again ."),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    corpus_fps = dedup_exact(
        spark.createDataFrame([(99, "unrelated corpus doc")], "doc_id long, text string")
    )

    # threshold between the fluent docs and the gibberish, derived
    # from the model itself (ordering pinned, no magic constant)
    model = lm_load(spark, model_dir)
    scored = {r["doc_id"]: r["ppl_bits"] for r in lm_score(batch, model).collect()}
    assert scored[2] > max(scored[1], scored[3])
    thresh = (scored[2] + max(scored[1], scored[3])) / 2

    src = tmp_path / "src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*.parquet"
    )
    out = str(tmp_path / "out")
    q = ingest_stream_semantic(
        stream,
        corpus_fps,
        str(tmp_path / "store"),
        out,
        checkpoint_dir=str(tmp_path / f"ckpt_{_uuid.uuid4().hex[:8]}"),
        semantic_cos=95,
        perplexity_model=model_dir,
        perplexity_max_bits=thresh,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 2 not in got, "gibberish must be dropped by the online LM gate"
    assert {1, 3} <= got

    # batch/stream gate-decision parity over the same (scrubbed) rows
    batch_keep = {
        r["doc_id"]
        for r in lm_score(batch, model).filter(perplexity_gate(thresh)).collect()
    }
    assert batch_keep == {1, 3} == got

    # model without threshold is a loud error, not a silent no-gate
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bits"):
        ingest_stream_semantic(
            stream, corpus_fps, str(tmp_path / "s2"), str(tmp_path / "o2"),
            perplexity_model=model_dir,
        )


def test_fuzzy_dedup_stream_matches_sequential_ingest_batch_twin(spark, tmp_path):
    """r17 wave 3 — the ONLINE MinHash near-dup gate completes the
    streaming dedup matrix (exact/fuzzy/semantic): a 3-micro-batch
    stream admits EXACTLY what sequentially calling
    llm_ops.dedup.ingest_batch over the same batches admits (the
    stream/batch twin IS the oracle, the module-wide rule). Planted
    structure: a batch-internal near-pair, a cross-batch near-copy,
    a cross-batch exact copy, and an in-batch exact copy — each drop
    class exercised across the store boundary."""
    from gcp_dataengineering_spark.llm_ops.dedup import (
        ingest_batch,
        minhash_band_rows,
    )
    from gcp_dataengineering_spark.llm_ops.text import fingerprint
    from gcp_dataengineering_spark.streaming.dedup import fuzzy_dedup_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    b1 = docs.filter(F.col("doc_id") < 30)
    # batch 2: novel docs + a near-copy of a b1 doc (cross-batch
    # fuzzy), an exact copy of a b1 doc (cross-batch exact), and a
    # near-internal pair
    novel2 = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))
    near_cross = b1.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq extra tail")).alias("text"),
    )
    exact_cross = b1.filter(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 2000).alias("doc_id"), "text"
    )
    near_internal = novel2.filter(F.col("doc_id") == 31).select(
        (F.col("doc_id") + 3000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq other tail")).alias("text"),
    )
    b2 = (
        novel2.unionByName(near_cross)
        .unionByName(exact_cross)
        .unionByName(near_internal)
    )
    # batch 3: novel docs + a near-copy of a b2 SURVIVOR
    novel3 = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 80))
    near_b2 = novel2.filter(F.col("doc_id") == 40).select(
        (F.col("doc_id") + 4000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq third tail")).alias("text"),
    )
    b3 = novel3.unionByName(near_b2)
    batches = [b1, b2, b3]

    # ---- twin: sequential ingest_batch over a maintained fp/band index
    fps = b1.limit(0).select(fingerprint("text").alias("fp"))
    bands = minhash_band_rows(b1.limit(0))
    expect_ids: set[int] = set()
    for b in batches:
        app, new_fps, new_bands = ingest_batch(b, fps, bands)
        expect_ids |= {r["doc_id"] for r in app.select("doc_id").collect()}
        fps = fps.unionByName(new_fps).localCheckpoint(eager=True)
        bands = bands.unionByName(new_bands).localCheckpoint(eager=True)
    # the planted dups actually exercised their drop classes
    assert 1003 not in expect_ids and 2007 not in expect_ids
    assert 4040 not in expect_ids
    assert not ({31, 3031} <= expect_ids)  # internal pair kept min-id only
    assert 31 in expect_ids

    # ---- stream: one micro-batch per file arrival
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*.parquet"
    )
    q = fuzzy_dedup_stream(
        stream,
        store,
        out,
        checkpoint_dir=str(tmp_path / f"ckpt_{uuid.uuid4().hex[:8]}"),
    )
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.parquet(str(src / "b2.parquet"))
        q.processAllAvailable()
        b3.coalesce(1).write.parquet(str(src / "b3.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()
    got_ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got_ids == expect_ids
    # the store's manifest holds one segment per admitting batch
    import json
    import os

    with open(os.path.join(store, "meta.json")) as fh:
        meta = json.load(fh)
    assert len(meta["segments"]) == 3
    assert meta["params"] == {"num_hashes": 8, "bands": 4, "n": 3}


def test_fuzzy_dedup_batch_replay_idempotent_and_params_guard(spark, tmp_path):
    """(a) At-least-once replay is idempotent on state: re-running
    the SAME batch admits nothing and writes no second segment (the
    fp anti-join drops every replayed doc); (b) reusing a store
    under a different LSH hash family raises instead of silently
    joining a meaningless band index."""
    import json
    import os

    import pytest as _pytest

    from gcp_dataengineering_spark.streaming.dedup import fuzzy_dedup_batch

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 20)
    )
    store = str(tmp_path / "store")
    first = fuzzy_dedup_batch(docs, store)
    n_first = first.count()
    assert n_first > 0
    gen1 = json.load(open(os.path.join(store, "meta.json")))["generation"]

    replay = fuzzy_dedup_batch(docs, store)
    assert replay.count() == 0
    meta = json.load(open(os.path.join(store, "meta.json")))
    assert meta["generation"] == gen1 and len(meta["segments"]) == 1

    with _pytest.raises(ValueError, match="hash family"):
        fuzzy_dedup_batch(docs, store, num_hashes=16, bands=8)


def test_fuzzy_store_auto_compaction_policy(spark, tmp_path):
    """r17 wave 3 — the fuzzy store's compaction policy (the
    semantic store's r16 shape): auto_compact_segments=K set ONCE
    persists in the meta and folds the history to one segment
    whenever a publish leaves more than K live; admission decisions
    equal an un-policed twin store batch-by-batch; retired dirs keep
    one-merge reader grace and the NEXT batch sweeps them."""
    import json
    import os

    from gcp_dataengineering_spark.streaming.dedup import fuzzy_dedup_batch

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    batches = [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 15))
        for lo in range(0, 75, 15)
    ]
    # plant a cross-batch near-dup so folded indexes are actually used
    batches[3] = batches[3].unionByName(
        batches[0].filter(F.col("doc_id") == 2).select(
            (F.col("doc_id") + 9000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq tail")).alias("text"),
        )
    )

    policed = str(tmp_path / "policed")
    twin = str(tmp_path / "twin")
    dirs_after_fold: set[str] | None = None
    admitted_all: set[int] = set()
    for i, b in enumerate(batches):
        got = fuzzy_dedup_batch(
            b, policed, auto_compact_segments=2 if i == 0 else None
        )
        want = fuzzy_dedup_batch(b, twin)
        g = {r["doc_id"] for r in got.select("doc_id").collect()}
        w = {r["doc_id"] for r in want.select("doc_id").collect()}
        assert g == w, f"batch {i}: {g ^ w}"
        admitted_all |= g
        meta = json.load(open(os.path.join(policed, "meta.json")))
        assert meta["auto_compact_segments"] == 2  # set once, persisted
        assert len(meta["segments"]) <= 2
        live = {s["dir"] for s in meta["segments"]}
        on_disk = {
            d for d in os.listdir(policed) if d.startswith("seg-")
        }
        if dirs_after_fold is not None:
            # last batch's retirees were swept at THIS batch's start
            assert not (dirs_after_fold - live) & on_disk
        dirs_after_fold = on_disk - live  # current retirees (grace)
        if len(meta["segments"]) == 1 and i > 0:
            assert dirs_after_fold  # a fold just happened; grace held
    assert 9002 not in admitted_all  # near-dup caught through FOLDED state
    twin_meta = json.load(open(os.path.join(twin, "meta.json")))
    assert len(twin_meta["segments"]) == 5  # un-policed twin kept all


def test_ingest_stream_dsir_gate_reproduces_batch_selection(spark, tmp_path):
    """r17 wave 4 — the DSIR gate online: calibrate the selection
    boundary from a batch dsir_resample run (the smallest selected
    quantized key), then the stream admits EXACTLY the batch-selected
    documents with identical weights and keys (the hash-Gumbel noise
    is content-stable, so the fixed threshold reproduces the sampled
    verdicts deterministically); a model without a threshold raises."""
    import pytest as _pytest

    from gcp_dataengineering_spark.llm_ops.dedup import dedup_exact
    from gcp_dataengineering_spark.llm_ops.dsir import (
        DSIR_KEY_SHIFT,
        dsir_fit,
        dsir_resample,
        dsir_score,
    )
    from gcp_dataengineering_spark.streaming.ingest import ingest_stream

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
        return (i, f"{base} page number marker {i} closes the page")

    batch = spark.createDataFrame(
        [page(i) for i in range(12)], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(f"{targetish} sample {j}",) for j in range(4)], "text string"
    )
    model_rows = dsir_fit(target, batch.select("text"), num_buckets=128).collect()
    model = spark.createDataFrame(
        model_rows, "bucket long, c_target long, c_raw long, weight long"
    )

    # batch calibration: run the real resample, read off the boundary
    sel = dsir_resample(
        dsir_score(batch, model), 1, 2, gumbel=True
    ).collect()
    selected = {r.doc_id: (r.dsir_logw, r.dsir_key) for r in sel if r.selected}
    min_key = min(k for _, k in selected.values()) >> DSIR_KEY_SHIFT

    corpus_fps = dedup_exact(
        spark.createDataFrame(
            [(999, "unrelated corpus doc")], "doc_id long, text string"
        )
    )
    src = tmp_path / "dsir_src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*.parquet"
    )
    name = f"dsir_{uuid.uuid4().hex[:8]}"
    q = (
        ingest_stream(
            stream, corpus_fps, dsir_model=model, dsir_min_key=min_key
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.doc_id: (r.dsir_logw, r.dsir_key)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()
    assert got == selected  # same docs, same weights, same keys

    with _pytest.raises(ValueError, match="dsir_min_key"):
        ingest_stream(stream, corpus_fps, dsir_model=model)


def test_ingest_stream_gopher_gates_match_batch_stages(spark, tmp_path):
    """r18 (r17 verdict item 4): BOTH batch Gopher stages run online
    in the composed semantic ingest — the §A1.1 structural rules
    in-query (gopher=True, batch stage-2a position) and the §A1.2
    repetition rules inside the foreachBatch turn (the doc-keyed
    aggregations are unsupported in-query; batch stage-2b position,
    before the LM gate). Planted: a structural violator that passes
    the base heuristic gate (60 twelve-char words: mean word length
    over 10, zero required stopwords) and a repetition violator that
    passes the structural rules (one line repeated 8x: dup_line_frac
    far over 0.30). Stream admission is pinned EQUAL to applying the
    batch stage expressions (gopher_features/gopher_pass then
    gopher_repetition_features.rep_pass) over the same rows, stage
    by stage."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from gcp_dataengineering_spark.llm_ops.dedup import dedup_exact
    from gcp_dataengineering_spark.llm_ops.text import (
        corpus_quality_gate,
        gopher_features,
        gopher_pass,
        gopher_repetition_features,
        quality_features,
    )
    from gcp_dataengineering_spark.streaming.ingest import (
        ingest_stream_semantic,
    )

    clean = "\n".join(
        f"the harbor{i} and gulls{i} of morning{i} that boats{i} have "
        f"sails{i} with winds{i}"
        for i in range(6)
    )  # 60 words, distinct lines/grams, 6 required-stopword hits
    structural = " ".join(f"abcdefghij{i:02d}" for i in range(60))
    # mean word length 12 > 10 and zero required stopwords — but the
    # BASE heuristic gate passes (60 tokens, no punctuation)
    rep_line = "the cats and dogs of that barn have slept with straw"
    repetitive = "\n".join([rep_line] * 8)  # dup_line_frac 7/8

    rows = [(1, clean), (2, structural), (3, repetitive)]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    corpus_fps = dedup_exact(
        spark.createDataFrame(
            [(99, "unrelated corpus document text")],
            "doc_id long, text string",
        )
    )

    # --- batch twin, stage by stage (the shared expressions) ---
    base_keep = {
        r.doc_id
        for r in quality_features(batch, "text")
        .filter(corpus_quality_gate())
        .collect()
    }
    assert base_keep == {1, 2, 3}, "violators must pass the BASE gate"
    struct_keep = {
        r.doc_id
        for r in gopher_features(quality_features(batch, "text"), "text")
        .filter(corpus_quality_gate() & gopher_pass())
        .collect()
    }
    assert struct_keep == {1, 3}, "structural stage must drop doc 2 only"
    rep_rows = {
        r.doc_id: r.rep_pass
        for r in gopher_repetition_features(
            batch.filter(F.col("doc_id").isin(*struct_keep)), "text", "doc_id"
        ).collect()
    }
    assert rep_rows[1] and not rep_rows[3]
    batch_admitted = {d for d in struct_keep if rep_rows[d]}
    assert batch_admitted == {1}

    # --- the stream, both flags on ---
    src = tmp_path / "src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*.parquet"
    )
    out = str(tmp_path / "out")
    q = ingest_stream_semantic(
        stream,
        corpus_fps,
        str(tmp_path / "store"),
        out,
        checkpoint_dir=str(tmp_path / f"ckpt_{_uuid.uuid4().hex[:8]}"),
        gopher=True,
        gopher_repetition=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert {r.doc_id for r in got.collect()} == batch_admitted == {1}
    # the structural feature columns are working columns, not payload
    assert not [c for c in got.columns if c.startswith("g_")]
