"""URL canonicalization + URL-level dedup (llm_ops/urls.py) — the
Common-Crawl capture-dedup primitive (dedup by URL precedes content
dedup; the same page is captured many times across crawls)."""

from __future__ import annotations


def test_normalize_url_semantics(spark):
    """Every contract clause from the module docstring, plus the
    near-miss traps (refresh≠ref, repeated params, '?' inside query
    values, non-URL passthrough, NULL safety)."""
    from gcp_dataengineering_spark.llm_ops.urls import normalize_url

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/To/Page?utm_source=x&b=2&a=1#frag",
         "http://example.com/Path/To/Page?a=1&b=2"),
        ("https://site.org:443/", "https://site.org/"),
        ("https://site.org", "https://site.org/"),
        ("http://site.org:8080/a/", "http://site.org:8080/a"),
        ("http://a.b/x?gclid=1&fbclid=2&utm_campaign=z&msclkid=7", "http://a.b/x"),
        # the WHOLE leading www. run folds in one pass (idempotence)
        ("http://www.www.example.com/a", "http://example.com/a"),
        ("http://WWW.WwW.wWw.example.com/a", "http://example.com/a"),
        ("http://www.org/x", "http://org/x"),  # run-strip, not label count
        ("http://a.b/x?z=1&y=2&z=0", "http://a.b/x?y=2&z=0&z=1"),
        ("http://a.b/x?ref=home&real=1", "http://a.b/x?real=1"),
        ("http://host/a?refresh=1", "http://host/a?refresh=1"),  # not 'ref'
        ("http://a.b/p?q=what?is?this#f#g", "http://a.b/p?q=what?is?this"),
        ("not a url at all", "not a url at all"),
        ("  http://spaced.example/a  ", "http://spaced.example/a"),
        ("ftp://Host.Example/File.TXT", "ftp://host.example/File.TXT"),
        ("http://host/?&&", "http://host/"),
        ("", ""),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, u string"
    )
    got = {r.i: r.o for r in df.select("i", normalize_url("u").alias("o")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_normalize_url_spark_duckdb_parity_fuzz(spark):
    """normalize_url vs normalize_url_sql on 300 seeded URL soups —
    the same shared-dialect contract as html.STEPS (the url_normalize
    oracle key rides on it)."""
    import random

    import duckdb

    from gcp_dataengineering_spark.llm_ops.urls import (
        normalize_url,
        normalize_url_sql,
    )

    rng = random.Random(20260814)
    frags = [
        "http://", "HTTPS://", "ftp://", "www.", "WWW.", "www.www.", "Example.COM",
        "site.org", ":80", ":443", ":8080", ":0", "/", "/A/b", "/x/",
        "?", "&", "=", "#frag", "#", "utm_source=1", "utm_x", "gclid=2",
        "ref", "ref=h", "refresh=1", "a=1", "b", "z=9", "??", "//",
        "name with space", "p%20q", "ünïcode", ":", "@user", "",
    ]
    urls = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 10)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, u string"
    )
    got = {r.i: r.o for r in df.select("i", normalize_url("u").alias("o")).collect()}
    con = duckdb.connect()
    expr = normalize_url_sql("u")
    bad = []
    for i, u in enumerate(urls):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS u)", [u]
        ).fetchone()[0]
        if got[i] != want:
            bad.append((u, got[i], want))
    assert not bad, bad[:3]


def test_dedup_by_url_keeps_latest_capture(spark):
    """One keeper per canonical URL, latest capture wins, ties broken
    by id — and the canonicalization is what collapses the variants
    (www/port/tracking-param/fragment forms of one page)."""
    from gcp_dataengineering_spark.llm_ops.urls import dedup_by_url

    rows = [
        # four captures of ONE logical page, different surface forms
        (1, "http://WWW.site.example:80/a?utm_source=x", "2024-01-01T00:00:00Z", "v1"),
        (2, "http://site.example/a#top", "2024-02-01T00:00:00Z", "v2"),
        (3, "http://site.example/a/", "2024-03-01T00:00:00Z", "v3"),
        (4, "http://site.example/a", "2024-03-01T00:00:00Z", "v3b"),  # date tie -> max id
        # a different page (param differs, not tracking)
        (5, "http://site.example/a?p=1", "2024-01-15T00:00:00Z", "other"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, target_uri string, warc_date string, text string"
    )
    out = {r.url_norm: r for r in dedup_by_url(df).collect()}
    assert set(out) == {
        "http://site.example/a",
        "http://site.example/a?p=1",
    }
    keeper = out["http://site.example/a"]
    assert keeper.doc_id == 4 and keeper.text == "v3b"  # latest, tie -> max id
    assert out["http://site.example/a?p=1"].doc_id == 5
    # original columns all survive
    assert set(out[keeper.url_norm].asDict()) == {
        "url_norm", "doc_id", "target_uri", "warc_date", "text"
    }


def test_dedup_by_url_unorderable_payload(spark):
    """The reducer orders ONLY on (order_col, id_col) via max_by, so
    a map-typed payload column — unorderable, would fail analysis
    under max(struct(<everything>)) — rides along untouched, and a
    full (order, id) tie never compares document text."""
    from pyspark.sql import functions as F

    from gcp_dataengineering_spark.llm_ops.urls import dedup_by_url

    df = spark.createDataFrame(
        [
            (1, "http://www.s.example/p", "2024-01-01", {"k": "old"}),
            (2, "http://s.example/p/", "2024-02-01", {"k": "new"}),
        ],
        "doc_id long, target_uri string, warc_date string, meta map<string,string>",
    )
    out = dedup_by_url(df).collect()
    assert len(out) == 1
    assert out[0].doc_id == 2 and out[0].meta == {"k": "new"}
    plan = dedup_by_url(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_gopher_rules_semantics(spark):
    """Each Gopher rule fires on a handcrafted violator and the
    clean-prose doc passes all of them (thresholds from the
    published §A1.1 set; word floor parameterized)."""
    from pyspark.sql import functions as F

    from gcp_dataengineering_spark.llm_ops.text import (
        gopher_features,
        gopher_pass,
    )

    clean = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "naps while the fox keeps running through the field to be safe "
        "and that was all they wrote have a good day with everyone"
    )
    docs = [
        (0, clean),
        (1, "the of and " + "a " * 60),                       # mean word len < 3
        (2, "the of and " + "supercalifragilistic " * 40),    # mean len > 10
        (3, "the of and have " + "# word " * 30),             # symbol ratio > 0.1
        (9, "the of and have " + "word... also " * 30),       # ASCII '...' counts too
        (4, "\n".join("• the item of x" for _ in range(10))), # bullets > 0.9
        (5, "the first line of it...\nthe second one too...\n"
            "and a normal line with that"),                   # ellipsis > 0.3
        (6, "the of and that " + "1234 5678 " * 30),          # alpha frac < 0.8
        (7, "lorem ipsum dolor sit amet " * 10),              # stopword hits < 2
        (8, "the of"),                                        # word floor
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in gopher_features(df)
        .withColumn("ok", gopher_pass(min_words=10))
        .collect()
    }
    assert out[0].ok, out[0]
    for i in range(1, 10):
        assert not out[i].ok, (i, out[i])
    # the specific feature each violator trips
    assert out[1].g_mean_word_len < 3.0
    assert out[2].g_mean_word_len > 10.0
    assert out[3].g_symbol_ratio > 0.1
    # '...' is one symbol occurrence (count = length-delta / 3), the
    # published two-spelling ellipsis rule (advice r9)
    assert out[9].g_symbol_ratio > 0.1
    assert out[4].g_bullet_line_frac > 0.9
    assert out[5].g_ellipsis_line_frac > 0.3
    assert out[6].g_alpha_word_frac < 0.8
    assert out[7].g_stopword_hits < 2
    assert out[8].g_n_words < 10
    # scan-shape: no exchange in the plan (pure row map)
    plan = (
        gopher_features(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pipeline_gopher_gate_optin(spark):
    """PipelineConfig(gopher=True) conjoins the Gopher rules into the
    page gate: a bullet-heavy listicle that passes the base corpus
    gate (long enough, stopworded, low punctuation) is kept by the
    default build and dropped by the Gopher build; clean prose
    survives both; the g_* feature columns do not leak downstream."""
    from gcp_dataengineering_spark.llm_ops.pipeline import (
        PipelineConfig,
        build_training_corpus,
    )

    prose = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "naps while the fox keeps running through the field to be safe "
        "and that was all they wrote have a good day with everyone here"
    )
    listicle = "\n".join(
        f"• the item number {i} of the catalog with more words here"
        for i in range(12)
    )
    docs = spark.createDataFrame(
        [(1, prose, "en", "s1"), (2, listicle, "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    base = build_training_corpus(
        docs, config=PipelineConfig(shard_budget_tokens=500)
    )
    kept_base = {r.doc_id for r in base["gated"].select("doc_id").collect()}
    assert kept_base == {1, 2}

    goph = build_training_corpus(
        docs,
        config=PipelineConfig(shard_budget_tokens=500, gopher=True,
                              gopher_min_words=10),
    )
    kept = {r.doc_id for r in goph["gated"].select("doc_id").collect()}
    assert kept == {1}  # the listicle fails bullet_line_frac > 0.9
    assert not any(
        c.startswith("g_") for c in goph["reputable"].columns
    )


def test_dedup_by_url_on_warc_bridge(spark, tmp_path):
    """Integration: repeated captures of one URL in a synthetic crawl
    collapse to the latest via dedup_by_url(warc_to_documents(...))."""
    from gcp_dataengineering_spark.llm_ops.urls import dedup_by_url
    from gcp_dataengineering_spark.llm_ops.warc import synth_warc, warc_to_documents

    recs = [
        dict(record_id="old", warc_type="response",
             target_uri="http://www.s.example/page?utm_source=a",
             date="2024-01-01T00:00:00Z",
             http_body="<p>old capture</p>", http_content_type="text/html"),
        dict(record_id="new", warc_type="response",
             target_uri="http://s.example/page",
             date="2024-06-01T00:00:00Z",
             http_body="<p>new capture</p>", http_content_type="text/html"),
        dict(record_id="other", warc_type="response",
             target_uri="http://s.example/elsewhere",
             date="2024-06-01T00:00:00Z",
             http_body="<p>different page</p>", http_content_type="text/html"),
    ]
    (tmp_path / "c.warc.gz").write_bytes(synth_warc(recs, gzip_members=True))
    files = spark.read.format("binaryFile").load(str(tmp_path) + "/*.warc.gz")
    docs = warc_to_documents(files)
    kept = dedup_by_url(docs).collect()
    assert len(kept) == 2
    by_url = {r.url_norm: r for r in kept}
    assert by_url["http://s.example/page"].text == "new capture"
    assert by_url["http://s.example/elsewhere"].text == "different page"


def test_normalize_url_idempotent(spark):
    """A canonicalization must be a projection: normalize(normalize(u))
    == normalize(u). Checked over the seeded fuzz corpus plus the
    handcrafted cases — one Spark pass computes both applications."""
    import random

    from pyspark.sql import functions as F

    from gcp_dataengineering_spark.llm_ops.urls import normalize_url

    rng = random.Random(4242)
    frags = [
        "http://", "HTTPS://", "www.", "Example.COM", ":80", ":443",
        ":8080", "/", "/A/b", "/x/", "?", "&", "=", "#f", "utm_source=1",
        "gclid=2", "ref", "ref=h", "refresh=1", "a=1", "b=2", "z=9",
        "word", "ünï", "??", "//", "",
    ]
    urls = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
        for _ in range(400)
    ] + [
        "HTTP://WWW.Example.COM:80/Path?utm_source=x&b=2&a=1#frag",
        "https://site.org:443/", "not a url", "",
        # the case the seeded corpora never generated (advice r9): a
        # one-prefix www-strip is NOT idempotent on a www. run
        "http://www.www.example.com/a",
        "https://WWW.www.WWW.site.org:443/b/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = normalize_url("u")
    twice = normalize_url(once)
    bad = (
        df.select("u", once.alias("n1"), twice.alias("n2"))
        .filter(~(F.col("n1").eqNullSafe(F.col("n2"))))
        .collect()
    )
    assert not bad, [(r.u, r.n1, r.n2) for r in bad[:3]]


def test_dedup_by_url_single_exchange_plan(spark):
    """Scale-shape receipt: the reducer is ONE exchange (partial
    map-side max feeding a final hash aggregate on the canonical
    url) — no window, no sort, no second shuffle."""
    from gcp_dataengineering_spark.llm_ops.urls import dedup_by_url

    df = spark.createDataFrame(
        [(i, f"http://s{i % 7}.example/p{i % 13}", f"2024-01-{i % 28 + 1:02d}", "x")
         for i in range(200)],
        "doc_id long, target_uri string, warc_date string, text string",
    )
    plan = dedup_by_url(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan and "SortMergeJoin" not in plan


def test_registrable_domain_fold(spark):
    """eTLD+1 fold: two-label public suffixes take three labels,
    everything else two; single-label and NULL pass through; www is
    just another subdomain label (the fold ignores it)."""
    from gcp_dataengineering_spark.llm_ops.urls import host_of, registrable_domain

    cases = [
        ("http://www.news.example.co.uk/a", "example.co.uk"),
        ("http://media.a.b.example.com/x", "example.com"),
        ("https://Example.COM/", "example.com"),
        ("http://example.co.uk:8080/", "example.co.uk"),
        ("http://co.uk/", "co.uk"),            # bare suffix: 2 labels
        ("http://localhost/x", "localhost"),   # single label
        ("http://sub.shop.com.au/", "shop.com.au"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, u string"
    )
    got = {
        r.i: r.d
        for r in df.select(
            "i", registrable_domain(host_of("u")).alias("d")
        ).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_registrable_domain_spark_duckdb_parity_fuzz(spark):
    """registrable_domain(host_of(u)) vs the SQL replay over seeded
    URL soups — same shared-dialect contract as normalize_url."""
    import random

    import duckdb

    from gcp_dataengineering_spark.llm_ops.urls import (
        host_of,
        host_of_sql,
        registrable_domain,
        registrable_domain_sql,
    )

    rng = random.Random(101)
    frags = [
        "http://", "https://", "www.", "a.", "b.", "example", ".co.uk",
        ".com", ".com.au", ".org", "", ":8080", "/p", "?q=1", "#f",
        "localhost", ".", "..", "xn--caf", "ünï",
    ]
    urls = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 8)))
        for _ in range(250)
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, u string")
    got = {
        r.i: r.d
        for r in df.select(
            "i", registrable_domain(host_of("u")).alias("d")
        ).collect()
    }
    con = duckdb.connect()
    expr = registrable_domain_sql(host_of_sql("u"))
    bad = []
    for i, u in enumerate(urls):
        want = con.execute(f"SELECT {expr} FROM (SELECT ? AS u)", [u]).fetchone()[0]
        if got[i] != want:
            bad.append((u, got[i], want))
    assert not bad, bad[:3]


def test_domain_stats_and_blocklist(spark):
    """Per-domain rollup (docs, distinct hosts, weight sum, blocked
    flag) and both blocklist forms: literal list = isin expression
    (no join in the plan), DataFrame = broadcast anti-join."""
    from gcp_dataengineering_spark.llm_ops.urls import (
        domain_stats,
        filter_blocked_domains,
    )

    rows = [
        (1, "http://www.news.example.co.uk/a", 100),
        (2, "http://media.example.co.uk/b", 200),
        (3, "http://shop.site.com/c", 10),
        (4, "http://site.com/d", 20),
        (5, "http://spam.example/e", 5),
        (6, "not a url", 999),  # drops from stats
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    stats = {
        r.domain: r
        for r in domain_stats(
            df, "url", weight_col="n_chars", blocklist=["spam.example"]
        ).collect()
    }
    assert set(stats) == {"example.co.uk", "site.com", "spam.example"}
    assert (stats["example.co.uk"].n_docs, stats["example.co.uk"].n_hosts,
            stats["example.co.uk"].weight_sum) == (2, 2, 300)
    assert (stats["site.com"].n_docs, stats["site.com"].n_hosts) == (2, 2)
    assert stats["spam.example"].blocked and not stats["site.com"].blocked

    kept = filter_blocked_domains(df, ["spam.example"], "url")
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3, 4, 6}  # non-URL kept
    # r13: the fold itself runs as BROADCAST rule joins (curated
    # table > case_rule_limit); the blocklist membership test must
    # still be an isin expression — no anti-join, no corpus exchange
    kplan = kept._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in kplan
    assert "SortMergeJoin" not in kplan
    assert "hashpartitioning" not in kplan

    bl = spark.createDataFrame([("spam.example",)], "domain string")
    kept2 = filter_blocked_domains(df, bl, "url")
    assert {r.doc_id for r in kept2.collect()} == {1, 2, 3, 4, 6}
    plan = kept2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_registrable_domain_psl_wildcard_exception(spark):
    """r10 verdict item 6: the fold accepts a caller-supplied
    PSL-syntax rule table with wildcard (``*.ck``) and exception
    (``!www.ck``) forms — data, not code; the shipped plain-rule
    subset stays the default. Verified in BOTH engines on the same
    cases, with PSL precedence (exception > longest suffix)."""
    import duckdb

    from gcp_dataengineering_spark.llm_ops.urls import (
        PUBLIC_SUFFIX_2,
        host_of,
        host_of_sql,
        registrable_domain,
        registrable_domain_sql,
    )

    rules = tuple(PUBLIC_SUFFIX_2) + ("*.ck", "!www.ck", "*.sch.uk")
    cases = [
        # wildcard: any label under .ck is a public suffix
        ("http://shop.stores.nowhere.ck/x", "stores.nowhere.ck"),
        ("http://nowhere.ck/", "nowhere.ck"),        # bare suffix passes through
        # exception: www.ck IS registrable, beats *.ck
        ("http://www.ck/", "www.ck"),
        ("http://deep.sub.www.ck/", "www.ck"),
        # multi-label wildcard
        ("http://pta.wellington.sch.uk/", "pta.wellington.sch.uk"),
        ("http://wellington.sch.uk/", "wellington.sch.uk"),
        # plain rules still fold as before alongside the new forms
        ("http://www.news.example.co.uk/a", "example.co.uk"),
        ("http://media.a.b.example.com/x", "example.com"),
        ("http://x.example.zz/", "example.zz"),       # unknown suffix: last 2
        ("http://localhost/", "localhost"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, u string"
    )
    got = {
        r.i: r.d
        for r in df.select(
            "i", registrable_domain(host_of("u"), rules=rules).alias("d")
        ).collect()
    }
    con = duckdb.connect()
    expr = registrable_domain_sql(host_of_sql("u"), rules=rules)
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)
        sql_got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS u)", [u]
        ).fetchone()[0]
        assert sql_got == want, (u, sql_got, want)

    # default table unchanged: no wildcard/exception branches appear
    base_expr = registrable_domain_sql(host_of_sql("u"))
    assert "*." not in base_expr and "!" not in base_expr


def test_registrable_domain_psl_property_fuzz(spark):
    """Seeded fuzz: random PSL rule tables (plain/wildcard/exception
    forms) × random hosts, checked against an INDEPENDENT Python
    implementation of the PSL match algorithm (match all rules right
    to left with * consuming one label; exception prevails, else
    longest match, default rule '*'; bare-suffix hosts pass through)
    — in BOTH engines. The compiled when-chain and the generic
    algorithm must agree everywhere, not just on crafted cases."""
    import random

    import duckdb

    from gcp_dataengineering_spark.llm_ops.urls import (
        registrable_domain,
        registrable_domain_sql,
    )

    def psl_reference(host, rules):
        if host is None:
            return None
        L = host.split(".")
        n = len(L)

        def matches(rl):
            if len(rl) > n:
                return False
            tail = L[-len(rl):]
            return all(r == "*" or r == h for r, h in zip(rl, tail))

        for r in (x.strip().lower() for x in rules):
            if r.startswith("!"):
                rl = r[1:].split(".")
                if matches(rl):
                    return ".".join(L[-len(rl):])
        best = 1  # the implicit default rule '*'
        for r in (x.strip().lower() for x in rules):
            if r.startswith("!"):
                continue
            rl = r.split(".")
            if matches(rl):
                best = max(best, len(rl))
        if n > best:
            return ".".join(L[-(best + 1):])
        return host

    rng = random.Random(20260815)
    labels = ["a", "b", "c", "www", "x1", "co"]
    con = duckdb.connect()
    for case in range(8):
        rules = ["co.uk", "com.au"]
        for _ in range(rng.randint(2, 5)):
            form = rng.choice(["plain", "wild", "exc"])
            base = ".".join(
                rng.choice(labels) for _ in range(rng.randint(1, 3))
            )
            if form == "plain":
                rules.append(base)
            elif form == "wild":
                rules.append("*." + base)
            else:
                rules.append("!" + base)
        hosts = [
            ".".join(rng.choice(labels) for _ in range(rng.randint(1, 5)))
            for _ in range(60)
        ] + [None]
        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(hosts)], "i int, h string"
        )
        got = {
            r.i: r.d
            for r in df.select(
                "i", registrable_domain("h", rules=tuple(rules)).alias("d")
            ).collect()
        }
        expr = registrable_domain_sql("h", rules=tuple(rules))
        for i, h in enumerate(hosts):
            want = psl_reference(h, rules)
            assert got[i] == want, (case, rules, h, got[i], want)
            sql_got = con.execute(
                f"SELECT {expr} FROM (SELECT ? AS h)", [h]
            ).fetchone()[0]
            assert sql_got == want, (case, rules, h, sql_got, want)


def test_registrable_domain_sql_escapes_rule_literals(spark):
    """r12 (ADVICE r11): a rule containing a single quote renders
    valid, correctly-escaped DuckDB SQL (the other SQL renderers in
    the module already used _sq(); this one now does too). Such a
    rule can't match a real host, but caller data must never be able
    to produce broken SQL."""
    import duckdb

    from gcp_dataengineering_spark.llm_ops.urls import registrable_domain_sql

    rules = ("co.uk", "o'quote.uk", "!w'x.ck", "*.y'z")
    expr = registrable_domain_sql("h", rules=rules)
    con = duckdb.connect()
    # parses and runs — before the fix this raised a parser error
    got = con.execute(
        f"SELECT {expr} FROM (SELECT 'a.example.co.uk' AS h)"
    ).fetchone()[0]
    assert got == "example.co.uk"


def _psl_reference_generic(host, rules):
    """Shared independent PSL algorithm (same as the r11 property
    fuzz's inline twin) — the falsification reference for BOTH
    with_registrable_domain strategies."""
    if host is None:
        return None
    L = host.split(".")
    n = len(L)

    def matches(rl):
        if len(rl) > n:
            return False
        tail = L[-len(rl):]
        return all(r == "*" or r == h for r, h in zip(rl, tail))

    for r in (x.strip().lower() for x in rules):
        if r.startswith("!"):
            rl = r[1:].split(".")
            if matches(rl):
                return ".".join(L[-len(rl):])
    best = 1
    for r in (x.strip().lower() for x in rules):
        if r.startswith("!"):
            continue
        rl = r.split(".")
        if matches(rl):
            best = max(best, len(rl))
    if n > best:
        return ".".join(L[-(best + 1):])
    return host


def test_with_registrable_domain_strategy_equivalence_fuzz(spark):
    """r12 PSL scale path: the broadcast-JOIN fold and the CASE
    compile are the same function — seeded fuzz over random rule
    tables (plain/wildcard/exception) × random hosts, both
    strategies checked against the independent Python PSL
    algorithm."""
    import random

    from gcp_dataengineering_spark.llm_ops.urls import with_registrable_domain

    rng = random.Random(20260816)
    labels = ["a", "b", "c", "www", "x1", "co"]
    for case in range(6):
        rules = ["co.uk", "com.au"]
        for _ in range(rng.randint(2, 6)):
            form = rng.choice(["plain", "wild", "exc"])
            base = ".".join(
                rng.choice(labels) for _ in range(rng.randint(1, 3))
            )
            rules.append(
                {"plain": base, "wild": "*." + base, "exc": "!" + base}[form]
            )
        hosts = [
            ".".join(rng.choice(labels) for _ in range(rng.randint(1, 5)))
            for _ in range(50)
        ] + [None]
        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(hosts)], "i int, h string"
        )
        for strategy in ("case", "join"):
            got = {
                r.i: r.domain
                for r in with_registrable_domain(
                    df, "h", rules=tuple(rules), strategy=strategy
                ).collect()
            }
            for i, h in enumerate(hosts):
                want = _psl_reference_generic(h, rules)
                assert got[i] == want, (case, strategy, rules, h, got[i], want)


def test_with_registrable_domain_full_psl_scale(spark):
    """The join fold digests a PSL-SCALE rule table (1,200 synthetic
    rules incl. wildcards and exceptions — the size at which a CASE
    chain stops compiling sanely) and still matches the independent
    Python algorithm AND the DuckDB CASE replay on every probe
    host. Plan receipt: broadcast hash joins only — no sort-merge
    join, no corpus hash-partition exchange."""
    import random

    import duckdb

    from gcp_dataengineering_spark.llm_ops.urls import (
        registrable_domain_sql,
        with_registrable_domain,
    )

    rng = random.Random(99)
    tlds = ["uk", "jp", "au", "br", "zz", "qq", "ck", "er"]
    seconds = ["co", "or", "ne", "ac", "go", "com", "net", "org", "sch"]
    rules = []
    seen = set()
    while len(rules) < 1200:
        form = rng.random()
        base = ".".join(
            rng.sample(seconds, rng.randint(1, 2)) + [rng.choice(tlds)]
        )
        if form < 0.05:
            r = "!" + "www." + base
        elif form < 0.15:
            r = "*." + base
        else:
            r = f"s{len(rules)}." + base
        if r not in seen:
            seen.add(r)
            rules.append(r)
    hosts = [
        ".".join(
            rng.sample(["x", "y", "www", "s17", "s300", "co", "com"],
                       rng.randint(1, 3))
            + [rng.choice(seconds), rng.choice(tlds)]
        )
        for _ in range(120)
    ] + ["s17.co.uk", "a.s17.co.uk", "www.ck", "b.www.ck", None]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i int, h string"
    )
    folded = with_registrable_domain(df, "h", rules=tuple(rules))  # auto → join
    got = {r.i: r.domain for r in folded.collect()}
    con = duckdb.connect()
    sql_expr = registrable_domain_sql("h", rules=tuple(rules))
    for i, h in enumerate(hosts):
        want = _psl_reference_generic(h, rules)
        assert got[i] == want, (h, got[i], want)
        sql_got = con.execute(
            f"SELECT {sql_expr} FROM (SELECT ? AS h)", [h]
        ).fetchone()[0]
        assert sql_got == want, (h, sql_got, want)
    plan = folded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning" not in plan


def test_curated_psl_spot_folds(spark):
    """r13 curated ~650-rule table: known folds across every rule
    family — plain 2-label, plain 3-label (k12.<state>.us), wildcard
    TLD + exception (*.ck / !www.ck), Japanese city wildcard +
    exception, and PRIVATE-section platform suffixes — via the
    default (join-fold) strategy AND the independent Python PSL
    algorithm."""
    from gcp_dataengineering_spark.llm_ops.urls import (
        PUBLIC_SUFFIX_CURATED,
        with_registrable_domain,
    )

    cases = {
        "www.bbc.co.uk": "bbc.co.uk",
        "news.example.com": "example.com",
        "a.b.k12.ca.us": "b.k12.ca.us",
        "foo.lib.tx.us": "foo.lib.tx.us",      # bare-suffix+1
        "deep.x.gov.cn": "x.gov.cn",
        "shop.example.com.au": "example.com.au",
        "b.www.ck": "www.ck",                   # exception rule
        # *.ck makes y.ck a public suffix → x.y.ck IS the registrable
        # domain, and a deeper host folds to the same last 3 labels
        "x.y.ck": "x.y.ck",
        "a.x.y.ck": "x.y.ck",
        "city.kawasaki.jp": "city.kawasaki.jp",  # !city.kawasaki.jp
        "sub.city.kawasaki.jp": "city.kawasaki.jp",
        "w.ward.kawasaki.jp": "w.ward.kawasaki.jp",  # *.kawasaki.jp
        "blog.alice.github.io": "alice.github.io",
        "bob.blogspot.com": "bob.blogspot.com",
        "page.bob.blogspot.com": "bob.blogspot.com",
        "plain.org": "plain.org",
        "single": "single",
        # r14-added registries: new ccTLD second-levels, the *.jm
        # wildcard, and the new platform/CDN tenant suffixes
        "www.dawn.com.pk": "dawn.com.pk",
        "mail.example.ac.lk": "example.ac.lk",
        "x.citizen.co.tz": "citizen.co.tz",
        "portal.example.gob.bo": "example.gob.bo",
        "a.b.example.com.kz": "example.com.kz",
        "deep.sub.anything.jm": "sub.anything.jm",
        "store.alice.myshopify.com": "alice.myshopify.com",
        "d111abc.cloudfront.net": "d111abc.cloudfront.net",
        "x.d111abc.cloudfront.net": "d111abc.cloudfront.net",
        # r18 tranche 9: JP municipal third-levels, the *.sch.uk
        # wildcard (school.la.sch.uk is the registrable domain),
        # dyn-DNS families, Azure regional suffixes, idna-computed
        # IDN second levels
        "www.city.chofu.tokyo.jp": "city.chofu.tokyo.jp",
        "a.b.naha.okinawa.jp": "b.naha.okinawa.jp",
        "www.stpauls.anytown.sch.uk": "stpauls.anytown.sch.uk",
        "myhost.is-a-geek.org": "myhost.is-a-geek.org",
        "x.myhost.from-ca.com": "myhost.from-ca.com",
        "vm1.eastus.cloudapp.azure.com": "vm1.eastus.cloudapp.azure.com",
        "www.site.xn--o1ac.xn--90a3ac": "site.xn--o1ac.xn--90a3ac",
    }
    assert len(PUBLIC_SUFFIX_CURATED) > 1000  # r14 extended table
    hosts = list(cases)
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i int, h string"
    )
    folded = with_registrable_domain(df, "h", rules=PUBLIC_SUFFIX_CURATED)
    plan = folded._jdf.queryExecution().executedPlan().toString()
    # >200 rules → auto must have picked the broadcast JOIN fold
    assert "BroadcastHashJoin" in plan
    got = {r.i: r.domain for r in folded.collect()}
    for i, h in enumerate(hosts):
        assert got[i] == cases[h], (h, got[i], cases[h])
        assert _psl_reference_generic(h, PUBLIC_SUFFIX_CURATED) == cases[h], h


def test_curated_psl_fuzz_vs_reference(spark):
    """Seeded fuzz over the curated table itself: hosts built from
    the table's own rule bases (plus noise labels), join fold vs the
    independent Python PSL algorithm vs the DuckDB CASE replay."""
    import random

    import duckdb

    from gcp_dataengineering_spark.llm_ops.urls import (
        PUBLIC_SUFFIX_CURATED,
        registrable_domain_sql,
        with_registrable_domain,
    )

    rng = random.Random(20260815)
    bases = [r.lstrip("!").lstrip("*.") for r in PUBLIC_SUFFIX_CURATED]
    noise = ["www", "a", "b2", "shop", "x"]
    hosts = []
    for _ in range(150):
        base = rng.choice(bases)
        k = rng.randint(0, 3)
        hosts.append(".".join(rng.choice(noise) for _ in range(k) ) + ("." if k else "") + base)
    hosts += [None, "", "just-a-label"]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i int, h string"
    )
    folded = with_registrable_domain(df, "h", rules=PUBLIC_SUFFIX_CURATED)
    got = {r.i: r.domain for r in folded.collect()}
    con = duckdb.connect()
    sql_expr = registrable_domain_sql("h", rules=PUBLIC_SUFFIX_CURATED)
    for i, h in enumerate(hosts):
        want = _psl_reference_generic(h, PUBLIC_SUFFIX_CURATED) if h else h
        assert got[i] == want, (h, got[i], want)
        sql_got = con.execute(
            f"SELECT {sql_expr} FROM (SELECT CAST(? AS VARCHAR) AS h)", [h]
        ).fetchone()[0]
        assert sql_got == want, (h, sql_got, want)


def test_domain_stats_default_plan_broadcast_only(spark):
    """domain_stats at the r13 default (curated table → join fold):
    every rule join is a BROADCAST hash join, no sort-merge join,
    and the only hash-partition exchange is the domain rollup's own
    groupBy."""
    from gcp_dataengineering_spark.llm_ops.urls import domain_stats

    df = spark.createDataFrame(
        [(i, f"http://sub{i % 3}.site{i % 5}.co.uk/p") for i in range(40)],
        "doc_id long, url string",
    )
    out = domain_stats(df, "url")
    rows = {r.domain: r for r in out.collect()}
    assert set(rows) == {f"site{i}.co.uk" for i in range(5)}
    assert rows["site0.co.uk"].n_hosts == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exchanges exist only for the rollup itself (domain / distinct
    # host two-phase agg) — NEVER keyed on a rule-join candidate
    import re as _re

    for part in _re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "_rd_" not in part, part
