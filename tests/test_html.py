"""HTML→text extraction (llm_ops/html.py) + the r9 WARC upgrades:
charset sniffing, member-by-member gzip streaming, and the
warc_to_documents prose contract (the r8 verdict's #1 gap: the
quality gate / lang_id / dedup / BPE previously judged raw markup)."""

from __future__ import annotations

import gzip

import pytest


# ------------------------------------------------------------- extractor unit
def test_html_to_text_semantics(spark):
    """The documented step contract on handcrafted pages: script/style
    dropped, comments dropped (unclosed swallows the tail), block tags
    → newlines, inline tags → spaces, curated entities decoded one
    level, whitespace collapsed + trimmed, NULL-safe."""
    from pyspark.sql import functions as F

    from gcp_dataengineering_spark.llm_ops.html import html_to_text

    pages = [
        (0, '<html><head><title>T</title><script>var a = 1 < 2 && "</div>";'
            "</script><style>p{color:red}</style></head><body>"
            "<!-- nav --><p>Tom &amp; Jerry &lt;3</p><div>second   line</div>"
            "<ul><li>one</li><li>two</li></ul>tail</body></html>"),
        (1, "<p>unclosed <script>evil()"),
        (2, "<p>before <!-- unterminated comment <b>never seen</b>"),
        (3, "plain prose, no markup"),
        (4, ""),
        (5, "<P CLASS='x'>UPPER <BR/> case</P>"),
        (6, "<div>&amp;lt; stays-encoded &#38;gt; one-level</div>"),
        (7, "a<b>inline</b>c &ldquo;q&rdquo;&nbsp;&#8212;&nbsp;d"),
        (8, None),
        # hex twins of the curated set (r9 second wave); r11: numeric
        # refs OUTSIDE the curated set now decode too (any code
        # point, either x case)
        (9, "it&#x27;s &#x201C;q&#x201D;&#xA0;&#x2014;&#xa0;ok &#x2603; &#X27;"),
        # r11 general numeric decode: arbitrary code points, C1
        # windows-1252 remap, invalid -> U+FFFD, overlong -> literal
        (10, "&#8364;100 &#147;w&#148; &#x1F600; bad&#0;&#55296;&#1114112; keep&#12345678;"),
        # single-pass: refs assembled BY decoding are never rescanned
        (11, "&#38;lt; &amp;#8364; &#38;#60;"),
        # r11 Latin-1 named block + euro; unknown names still pass
        (12, "caf&eacute; &Uuml;ber &ntilde; &szlig; 5&euro; &bogus; &Eacute;"),
    ]
    df = spark.createDataFrame(pages, "i int, t string")
    got = {r.i: r.o for r in df.select("i", html_to_text("t").alias("o")).collect()}
    assert got[0] == 'T\nTom & Jerry <3\nsecond line\none\ntwo\ntail'
    assert got[1] == "unclosed"
    assert got[2] == "before"
    assert got[3] == "plain prose, no markup"
    assert got[4] == ""
    assert got[5] == "UPPER\ncase"
    # &amp;lt; decodes exactly ONE level (single-pass unescape)
    assert got[6] == "&lt; stays-encoded &gt; one-level"
    assert got[7] == "a inline c “q” — d"
    assert got[8] is None
    assert got[9] == "it's “q” — ok ☃ '"
    # r12: the widened digit bound brings 8-digit references in-bound
    # — 12345678 > 0x10FFFF clamps to U+FFFD like the other invalid
    # scalars (it passed through as literal text under the r11 bound)
    assert got[10] == "€100 “w” 😀 bad��� keep�"
    assert got[11] == "&lt; &#8364; &#60;"
    assert got[12] == "café Über ñ ß 5€ &bogus; É"
    # accepts a Column too
    assert (
        df.filter("i = 3").select(html_to_text(F.col("t"))).first()[0]
        == "plain prose, no markup"
    )


def test_html_steps_spark_duckdb_parity(spark):
    """The SAME html.STEPS list compiled both ways (html_to_text vs
    html_text_sql) must produce byte-identical output on hostile
    markup — this is the engine-dialect contract the html_text oracle
    key rides on (Java regex ∩ RE2: no backrefs, no lookaround)."""
    import duckdb

    from gcp_dataengineering_spark.llm_ops.html import html_text_sql, html_to_text

    pages = [
        '<script src="x.js">a</script><SCRIPT>b</SCRIPT>c',
        "<style>a{}</style>txt<style >unclosed",
        "<!-- a --><!-- b -->keep<!-- unclosed",
        "<td>cell</td><th>head</th><table><tr><td>x</td></tr></table>",
        "stray < bracket > then <em>fine</em>",
        "&quot;&apos;&hellip;&copy;&reg;&trade;&deg;&middot;&bull;",
        "&ndash;&mdash;&lsquo;&rsquo;&#8211;&#8216;&#8217;&#8230;",
        "a\r\nb\rc\nd\te\ff",
        "  \n\t leading and trailing \n  ",
        "<div attr='multi\nline'>v</div>",
        "<a href='x'>link</a>-<span>s</span>",
        "&#34;&#39;&#60;&#62;&#160;&#8220;&#8221;",
        # r12 (ADVICE r11): zero-padded numeric references decode —
        # the digit bound is now 18 decimal / 15 hex; beyond-bound
        # digit strings still pass through as the documented limit
        "&#0000038;&#x0000000000020AC;&#000000000000000060;",
        "&#0000000000000000038;&#x0000000000000020AC;",  # over-bound: literal
        "&#999999999999999999;&#xFFFFFFFFFFFFFFF;",  # in-bound, > max cp -> FFFD
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "i int, t string"
    )
    got = {
        r.i: r.o for r in df.select("i", html_to_text("t").alias("o")).collect()
    }
    con = duckdb.connect()
    expr = html_text_sql("t")
    for i, p in enumerate(pages):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS t)", [p]
        ).fetchone()[0]
        assert got[i] == want, f"page {i}: {got[i]!r} != {want!r}"


def test_html_zero_padded_numeric_refs_decode(spark):
    """r12 (ADVICE r11): zero-padded references decode to the same
    character as their canonical spelling (absolute check against
    html.unescape, not just cross-engine agreement); digit strings
    beyond the documented 18/15 bound pass through as literal text."""
    import html as _html

    from gcp_dataengineering_spark.llm_ops.html import html_to_text

    cases = [
        "&#0000038;", "&#038;", "&#x0000020AC;", "&#x20AC;",
        "&#000000000000000060;",
    ]
    over = "&#0000000000000000038;"  # 19 digits: documented pass-through
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases + [over])], "i int, t string"
    )
    got = {r.i: r.o for r in df.select("i", html_to_text("t").alias("o")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == _html.unescape(c), (c, got[i])
    assert got[len(cases)] == over


def test_html_steps_parity_fuzz(spark):
    """Seeded fuzz over 200 random tag/entity/whitespace soups — the
    Java-regex ∩ RE2 shared-dialect claim must hold beyond crafted
    pages (nesting, truncation mid-token, stray brackets, mixed
    case, unicode). One Spark pass for all pages; DuckDB replays
    each."""
    import random

    import duckdb

    from gcp_dataengineering_spark.llm_ops.html import html_text_sql, html_to_text

    rng = random.Random(20260814)
    frags = [
        "<script>", "</script>", "<SCRIPT a='b'>", "<style>", "</style >",
        "<!--", "-->", "<p>", "</p>", "<DIV>", "<br/>", "<li >", "</ul>",
        "<a href='x y'>", "</a>", "<em", ">", "<", ">", "&amp;", "&lt;",
        "&nbsp;", "&#8212;", "&bogus;", "&#x27;", "&", ";", "word", "tëxt",
        "Ωmega", " ", "  ", "\n", "\t", "\r\n", "a<b", "x>y", "<td>", "<>",
        # r11 general numeric decode: arbitrary/hex/capital-X code
        # points, C1 remaps, invalid scalars, overlong digits,
        # truncated-mid-token
        "&#8364;", "&#x1F600;", "&#X27;", "&#147;", "&#0;", "&#55296;",
        "&#1114111;", "&#1114112;", "&#12345678;", "&#x", "&#", "&#;",
        "&#xG;", "&#160;&#xa0;",
        # r12 zero-padded + bound-edge numeric forms
        "&#0000038;", "&#x0000020AC;", "&#000000000000000001;",
        "&#999999999999999999;", "&#xFFFFFFFFFFFFFFF;",
        # r11 Latin-1 named block (+ prefix-shadow probes: a name cut
        # mid-token, mixed case, unknown)
        "&eacute;", "&Uuml;", "&szlig;", "&euro;", "&eacute", "&EACUTE;",
        "&nt", "&ntilde;x",
        '<meta charset="utf-8">', "<![CDATA[", "]]>", "<!DOCTYPE html>",
    ]
    pages = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "i int, t string"
    )
    got = {
        r.i: r.o for r in df.select("i", html_to_text("t").alias("o")).collect()
    }
    con = duckdb.connect()
    expr = html_text_sql("t")
    bad = []
    for i, p in enumerate(pages):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS t)", [p]
        ).fetchone()[0]
        if got[i] != want:
            bad.append((i, p, got[i], want))
    assert not bad, bad[:3]


# ------------------------------------------------------------ charset sniffing
def test_warc_charset_sniffing(spark, tmp_path):
    """r8 verdict item 6: the HTTP Content-Type charset parameter is
    honored, an HTML <meta charset> probe covers header-less pages,
    and the fallback chain is strict-UTF-8 → latin-1. The quarantine
    contract is unchanged."""
    from gcp_dataengineering_spark.llm_ops.warc import synth_warc, warc_records

    latin = "Señor café"  # round-trips ISO-8859-1
    cyr = "Привет мир"  # windows-1251
    recs = [
        dict(record_id="l1", warc_type="response",
             target_uri="http://a.example/1",
             http_body=latin.encode("iso-8859-1"),
             http_content_type="text/html; charset=ISO-8859-1"),
        dict(record_id="c1", warc_type="response",
             target_uri="http://a.example/2",
             http_body=cyr.encode("windows-1251"),
             http_content_type="text/html; charset=windows-1251"),
        # no header charset: the <meta charset> probe decides
        dict(record_id="m1", warc_type="response",
             target_uri="http://a.example/3",
             http_body=('<html><head><meta charset="windows-1251"></head>'
                        "<body>" + cyr + "</body></html>").encode("windows-1251"),
             http_content_type="text/html"),
        # http-equiv form of the meta declaration
        dict(record_id="m2", warc_type="response",
             target_uri="http://a.example/4",
             http_body=('<meta http-equiv="Content-Type" '
                        'content="text/html; charset=iso-8859-1">'
                        + latin).encode("iso-8859-1"),
             http_content_type="text/html"),
        # undeclared: plain UTF-8 must decode exactly (strict pass)
        dict(record_id="u1", warc_type="response",
             target_uri="http://a.example/5",
             http_body=cyr.encode("utf-8"), http_content_type="text/plain"),
        # undeclared non-UTF-8: latin-1 total fallback, never a crash
        dict(record_id="f1", warc_type="response",
             target_uri="http://a.example/6",
             http_body=latin.encode("iso-8859-1"),
             http_content_type="text/plain"),
        # bogus charset label falls through to the sniff-free chain
        dict(record_id="b1", warc_type="response",
             target_uri="http://a.example/7",
             http_body=cyr.encode("utf-8"),
             http_content_type="text/plain; charset=no-such-encoding"),
    ]
    (tmp_path / "cs.warc.gz").write_bytes(synth_warc(recs, gzip_members=True))
    files = spark.read.format("binaryFile").load(str(tmp_path) + "/*.warc.gz")
    by = {r.record_id: r for r in warc_records(files).collect()}
    by = {k.split(":")[-1].rstrip(">"): v for k, v in by.items()}
    assert by["l1"].text == latin
    assert by["c1"].text == cyr
    assert cyr in by["m1"].text
    assert latin in by["m2"].text
    assert by["u1"].text == cyr
    assert by["f1"].text == latin
    assert by["b1"].text == cyr
    assert all(v.parse_error is None for v in by.values())


# --------------------------------------------------- gzip member streaming
def test_warc_gzip_member_streaming(tmp_path):
    """ADVICE r8: .warc.gz decompresses member by member (peak memory
    one member, not the segment). A record SPANNING two members
    (nonstandard but legal) still parses via the carry-over buffer;
    mid-file member corruption quarantines the tail but keeps every
    record that already parsed."""
    from gcp_dataengineering_spark.llm_ops.warc import (
        _gzip_members,
        parse_warc_members,
        synth_warc,
    )

    recs = [
        dict(record_id=f"r{i}", warc_type="response",
             target_uri=f"http://x.example/{i}", http_body=f"body {i}",
             http_content_type="text/plain")
        for i in range(3)
    ]
    gz = synth_warc(recs, gzip_members=True)
    members = [m for m in _gzip_members(gz)]
    assert len(members) == 3 and all(isinstance(m, bytes) for m in members)

    # record split across two gzip members at an arbitrary byte
    raw = synth_warc(recs)
    split = len(raw) // 2 + 7
    spanning = gzip.compress(raw[:split]) + gzip.compress(raw[split:])
    parsed = list(parse_warc_members(spanning))
    assert [r["headers"]["warc-record-id"] for r in parsed] == [
        f"<urn:uuid:r{i}>" for i in range(3)
    ]

    # corrupt middle member: first member's record survives, the tail
    # quarantines as ONE error row (pre-r9 lost the whole file)
    m0 = gzip.compress(synth_warc([recs[0]]))
    m1 = bytearray(gzip.compress(synth_warc([recs[1]])))
    m1[12] ^= 0xFF  # flip a byte inside the deflate stream
    m2 = gzip.compress(synth_warc([recs[2]]))
    out = list(parse_warc_members(bytes(m0 + m1 + m2)))
    good = [r for r in out if "error" not in r]
    errs = [r for r in out if "error" in r]
    assert [r["headers"]["warc-record-id"] for r in good] == ["<urn:uuid:r0>"]
    assert len(errs) == 1 and "gzip" in errs[0]["error"]


def test_warc_gzip_many_members_linear_time(tmp_path):
    """ADVICE r9 (high): feeding the ENTIRE remaining blob to a fresh
    decompressobj per member makes zlib copy the tail into
    unused_data at every member boundary — O(members × file_size),
    measured 7.6 s at 40 MB / 2000 members and extrapolating to hours
    on a real Common-Crawl segment (~100k members / ~1 GB). The
    chunk-bounded loop is linear: the same 2000-member / ~40 MB blob
    must decompress in seconds, with every member intact — including
    a member larger than the 1 MiB feed chunk (multi-chunk inner
    loop) and the members that follow it (boundary-inside-chunk)."""
    import gzip as _gzip
    import os
    import time

    from gcp_dataengineering_spark.llm_ops.warc import _GZ_CHUNK, _gzip_members

    rng_payloads = [os.urandom(20_000) for _ in range(50)]  # incompressible
    blob = bytearray()
    want = []
    big = os.urandom(3 * _GZ_CHUNK)  # one member spanning >3 feed chunks
    for i in range(2000):
        p = big if i == 17 else rng_payloads[i % 50]
        want.append(p)
        blob += _gzip.compress(p, compresslevel=1)
    # per-machine baseline: CPython's all-C multi-member decompress of
    # the SAME blob is the linear floor — a loaded/slow machine slows
    # both sides, so the RATIO bound doesn't flake (ADVICE r10: the
    # old absolute 5 s bound could); the absolute floor term keeps the
    # bound meaningful when the baseline is near the timer resolution
    t0 = time.monotonic()
    _ = _gzip.decompress(bytes(blob))
    t_base = time.monotonic() - t0
    t0 = time.monotonic()
    got = list(_gzip_members(bytes(blob)))
    dt = time.monotonic() - t0
    assert got == want
    # measured here: quadratic 7.6 s, linear ~0.6 s, C baseline ~0.2 s
    assert dt < max(3.0, 12 * t_base), (
        f"many-member decompression took {dt:.1f}s "
        f"(C baseline {t_base:.2f}s) — quadratic?"
    )


# ------------------------------------------------- warc_to_documents contract
def test_warc_to_documents_extracts_prose(spark, tmp_path):
    """The corpus pipeline judges PROSE, not markup: a page whose
    quality-relevant ratios would pass on raw HTML noise but whose
    actual text is garbage (and vice versa) must be scored on the
    extracted text. doc_id is the spec-unique WARC-Record-ID string
    (no 64-bit hash — birthday collisions at crawl scale, ADVICE r8)."""
    from pyspark.sql import functions as F

    from gcp_dataengineering_spark.llm_ops.text import quality_features
    from gcp_dataengineering_spark.llm_ops.warc import synth_warc, warc_to_documents

    prose = ("the quick brown fox jumps over the lazy dog and then "
             "the dog naps while the fox keeps running through the field")
    tag_heavy = (
        '<html><head><script>var x = {a: 1, b: "!!!###"};</script>'
        "<style>.c{margin:0}</style></head><body><!-- chrome -->"
        "<nav><li>Home</li><li>About</li></nav><p>" + prose + "</p>"
        "</body></html>"
    )
    markup_only = ("<div><span></span><script>f();g();h();%%%%</script>"
                   "<style>a{}b{}c{}</style></div>")
    recs = [
        dict(record_id="good", warc_type="response",
             target_uri="http://s.example/good", http_body=tag_heavy,
             http_content_type="text/html"),
        dict(record_id="empty", warc_type="response",
             target_uri="http://s.example/empty", http_body=markup_only,
             http_content_type="text/html"),
        dict(record_id="plain", warc_type="response",
             target_uri="http://s.example/plain", http_body="keep <b> as-is",
             http_content_type="text/plain"),
    ]
    (tmp_path / "p.warc.gz").write_bytes(synth_warc(recs, gzip_members=True))
    files = spark.read.format("binaryFile").load(str(tmp_path) + "/*.warc.gz")
    docs = warc_to_documents(files, keep_raw=True)
    by = {r.doc_id.split(":")[-1].rstrip(">"): r for r in docs.collect()}

    assert by["good"].doc_id == "<urn:uuid:good>"  # spec-unique string id
    # markup stripped; nav chrome collapses to line-broken words
    assert prose in by["good"].text
    assert "<" not in by["good"].text and "script" not in by["good"].text
    assert by["good"].raw_html.startswith("<html>")
    assert by["good"].lang == "en"
    # markup-only page extracts to '' — downstream min-length gates it
    assert by["empty"].text == ""
    # non-HTML text passes through VERBATIM (extraction is HTML-only)
    assert by["plain"].text == "keep <b> as-is"

    # the quality gate judges the extracted prose: the tag-heavy page
    # scores like its prose; the markup-only page fails on length
    feats = quality_features(
        docs.select("doc_id", "text"), text_col="text"
    ).collect()
    f = {r.doc_id.split(":")[-1].rstrip(">"): r for r in feats}
    assert f["good"].n_chars_calc == len(by["good"].text)
    assert f["empty"].n_chars_calc == 0

    # pre-r9 escape hatch: raw payload preserved under extract_text=False
    raw = {
        r.doc_id.split(":")[-1].rstrip(">"): r
        for r in warc_to_documents(files, extract_text=False).collect()
    }
    assert raw["good"].text.startswith("<html>")


def test_warc_corpus_e2e_gates_on_prose(spark, tmp_path):
    """End-to-end done-criterion from the r8 verdict: in
    warc_to_documents → build_training_corpus, a tag-heavy page
    passes or fails the quality gate on its PROSE. Identical prose
    wrapped in wildly different markup must also dedup together once
    extracted (tags no longer pollute the shingles)."""
    from gcp_dataengineering_spark.llm_ops.pipeline import (
        PipelineConfig,
        build_training_corpus,
    )
    from gcp_dataengineering_spark.llm_ops.warc import synth_warc, warc_to_documents

    def filler(i):
        return (
            "the quick brown fox jumps over the lazy dog and the "
            + " ".join(f"w{i}x{j} t{i}y{j} u{i}z{j}" for j in range(12))
        )

    pages = [
        dict(record_id=f"p{i}", warc_type="response",
             target_uri=f"http://site{i % 2}.example/p{i}",
             http_body="<html><body><nav><li>Home</li></nav><p>"
                       + filler(i) + "</p><!-- chrome --></body></html>",
             http_content_type="text/html")
        for i in range(4)
    ]
    # same prose as p0, radically different markup: a near-dup PAIR
    # only visible after extraction
    clone = dict(
        record_id="clone", warc_type="response",
        target_uri="http://site0.example/clone",
        http_body='<div class="wrap"><section><h1></h1><span>'
                  + filler(0) + "</span></section></div>",
        http_content_type="text/html")
    # markup-only page: must be gated OUT on prose length, even though
    # its RAW html is long enough to sneak past a raw-text length gate
    chrome = dict(
        record_id="chrome", warc_type="response",
        target_uri="http://site1.example/chrome",
        http_body="<html><head><script>" + "var filler_x = 1;" * 40
                  + "</script><style>" + ".c{margin:0}" * 30
                  + "</style></head><body><!-- boilerplate --></body></html>",
        http_content_type="text/html")
    (tmp_path / "e.warc.gz").write_bytes(
        synth_warc(pages + [clone, chrome], gzip_members=True)
    )
    files = spark.read.format("binaryFile").load(str(tmp_path) + "/*.warc.gz")
    docs = warc_to_documents(files)
    stages = build_training_corpus(
        docs,
        config=PipelineConfig(
            shard_budget_tokens=500, minhash_hashes=16, lsh_bands=4
        ),
    )
    kept = {r.doc_id.split(":")[-1].rstrip(">") for r in
            stages["corpus"].select("doc_id").collect()}
    # chrome-only page gated out on PROSE; its raw HTML was long
    assert "chrome" not in kept
    # prose-identical pair collapsed by dedup to one survivor
    assert len({"p0", "clone"} & kept) == 1
    # the distinct prose pages survive
    assert {"p1", "p2", "p3"} <= kept


def test_warc_parser_never_crashes_fuzz():
    """Robustness property: arbitrary byte mutations of valid WARC
    bytes (bit flips, truncations, splices, gzip-layer damage) must
    always TERMINATE and yield only record/error dicts — the
    quarantine contract, fuzzed. This is pure Python (no Spark), so
    hundreds of mutants are cheap."""
    import gzip
    import random

    from gcp_dataengineering_spark.llm_ops.warc import parse_warc_members, synth_warc

    rng = random.Random(20260814)
    recs = [
        dict(record_id=f"r{i}", warc_type="response",
             target_uri=f"http://x.example/{i}",
             http_body="body " * (i + 1), http_content_type="text/plain")
        for i in range(4)
    ]
    plain = synth_warc(recs)
    gz = synth_warc(recs, gzip_members=True)
    for base in (plain, gz):
        for _ in range(300):
            buf = bytearray(base)
            op = rng.randrange(4)
            if op == 0 and buf:  # bit flips
                for _ in range(rng.randint(1, 8)):
                    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            elif op == 1:  # truncate
                del buf[rng.randrange(len(buf) + 1):]
            elif op == 2:  # splice random garbage
                pos = rng.randrange(len(buf) + 1)
                buf[pos:pos] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 40)))
            else:  # duplicate a slice (repeated/overlapping records)
                a = rng.randrange(len(buf) + 1)
                b = min(len(buf), a + rng.randint(1, 200))
                buf[a:a] = buf[a:b]
            out = list(parse_warc_members(bytes(buf)))
            assert len(out) < 10_000  # termination with bounded output
            for rec in out:
                assert ("error" in rec) or ("headers" in rec and "body" in rec)


def test_warc_records_chunked_output_frames(spark, tmp_path):
    """The 4096-row chunk flush in warc_records (the bounded-memory
    contract) actually engages and loses nothing: a segment with
    more records than one chunk parses completely and exactly."""
    from gcp_dataengineering_spark.llm_ops.warc import synth_warc, warc_records

    n = 4100  # crosses the 4096-row chunk boundary
    recs = [
        dict(record_id=f"r{i}", warc_type="response",
             target_uri=f"http://x.example/{i}", http_body=f"b{i}",
             http_content_type="text/plain")
        for i in range(n)
    ]
    (tmp_path / "big.warc.gz").write_bytes(synth_warc(recs, gzip_members=True))
    files = spark.read.format("binaryFile").load(str(tmp_path) + "/*.warc.gz")
    out = warc_records(files)
    assert out.count() == n
    ids = {r.record_id for r in out.select("record_id").collect()}
    assert len(ids) == n and "<urn:uuid:r4099>" in ids
    texts = {r.text for r in out.limit(5).collect()}
    assert all(t and t.startswith("b") for t in texts)
