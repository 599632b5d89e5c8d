"""WARC ingestion (beyond-reference LLM-pipeline source): the
Common-Crawl container format, parsed with pure Python over Spark's
``binaryFile`` source — no external WARC library (the format is
line-oriented: ``WARC/1.0\\r\\n`` + headers + blank line +
``Content-Length`` body + ``\\r\\n\\r\\n``), Arrow-batched via
``mapInPandas`` like the multimodal decoders.

Scale shape: ``binaryFile`` gives one row per .warc(.gz) file;
record splitting parallelizes ACROSS files (Common Crawl ships ~1 GB
segments by the tens of thousands, so file-granularity is the
natural unit). Multi-member gzip (the standard record-per-member
.warc.gz layout) decompresses transparently. Malformed records are
QUARANTINED as rows with ``parse_error`` set, never a job death —
the same contract as the CSV corrupt-line capture.

Charset handling (r9): the HTTP ``Content-Type`` charset parameter
is honored, then an HTML ``<meta charset>`` / ``http-equiv`` probe
over the first 1024 payload bytes, then strict UTF-8, then latin-1
(which cannot fail — every byte value is a valid code point). Only
``text/*`` / ``*html*`` payloads are decoded; everything else
reports metadata with a NULL body.

Memory shape (r9, ADVICE): .warc.gz segments are decompressed
MEMBER BY MEMBER via ``zlib.decompressobj`` + ``unused_data`` (the
standard Common-Crawl layout is one record per gzip member), and
records parse incrementally out of a carry-over buffer — peak
executor memory is one member + one output chunk, not the whole
~4-5 GB decompressed segment. A nonstandard single-member .warc.gz
still decompresses whole (documented cap: such a file IS one
member). Gzip-level corruption quarantines the file's remaining
tail (one error row) — strictly better than the pre-r9 behavior of
losing the entire file.
"""

from __future__ import annotations

import gzip
import re as _re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["synth_warc", "parse_warc_members", "warc_records", "warc_to_documents", "WARC_SCHEMA"]

_CRLF = b"\r\n"


def synth_warc(
    records: list[dict],
    gzip_members: bool = False,
) -> bytes:
    """Spec-valid WARC/1.0 bytes for tests: each dict gives
    ``warc_type``, ``record_id``, ``target_uri``, ``date`` and either
    ``payload`` (raw body bytes) or ``http_body`` (+ optional
    ``http_content_type``/``http_status`` — wrapped in a minimal HTTP
    response). ``gzip_members=True`` emits the standard
    record-per-gzip-member .warc.gz layout."""
    out = []
    for r in records:
        if "http_body" in r:
            body = r["http_body"].encode("utf-8") if isinstance(
                r["http_body"], str
            ) else r["http_body"]
            status = r.get("http_status", 200)
            ctype = r.get("http_content_type", "text/html")
            payload = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
            block_type = "application/http; msgtype=response"
        else:
            payload = r.get("payload", b"")
            block_type = r.get("content_type", "application/octet-stream")
        head = (
            b"WARC/1.0" + _CRLF
            + f"WARC-Type: {r.get('warc_type', 'response')}".encode() + _CRLF
            + f"WARC-Record-ID: <urn:uuid:{r['record_id']}>".encode() + _CRLF
            + f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}".encode() + _CRLF
            + f"WARC-Target-URI: {r.get('target_uri', '')}".encode() + _CRLF
            + f"Content-Type: {block_type}".encode() + _CRLF
            + f"Content-Length: {len(payload)}".encode() + _CRLF
            + _CRLF
        )
        member = head + payload + _CRLF + _CRLF
        out.append(gzip.compress(member) if gzip_members else member)
    return b"".join(out)


class _Truncated(ValueError):
    """The buffer ends mid-record: more bytes could complete it. The
    incremental parser waits for the next gzip member on this; at
    end-of-input it degrades to an ordinary quarantine ValueError."""


def _parse_one(buf, offset: int) -> tuple[dict, int]:
    """Parse one record starting at ``offset`` (caller has already
    skipped inter-record CRLFs); returns (record, next_offset).
    Raises :class:`_Truncated` where more input could complete the
    record, plain ValueError on structural corruption (caller
    quarantines + resyncs)."""
    n = len(buf)
    line_end = buf.find(_CRLF, offset)
    if line_end < 0:
        raise _Truncated(f"expected WARC version line at byte {offset}")
    if not buf[offset:line_end].startswith(b"WARC/"):
        raise ValueError(f"expected WARC version line at byte {offset}")
    headers: dict[str, str] = {}
    pos = line_end + 2
    while True:
        line_end = buf.find(_CRLF, pos)
        if line_end < 0:
            raise _Truncated("unterminated WARC header block")
        line = buf[pos:line_end]
        pos = line_end + 2
        if not line:
            break
        k, _, v = line.partition(b":")
        headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
            "utf-8", "replace"
        ).strip()
    try:
        length = int(headers["content-length"])
    except (KeyError, ValueError) as ex:
        raise ValueError(f"bad/missing Content-Length: {ex}") from ex
    if length < 0:
        # a negative length would walk the parser BACKWARDS into an
        # infinite re-parse loop — malformed, quarantine
        raise ValueError(f"negative Content-Length: {length}")
    if pos + length > n:
        raise _Truncated("record body truncated")
    body = bytes(buf[pos:pos + length])
    return {"headers": headers, "body": body}, pos + length


_GZ_CHUNK = 1 << 20  # compressed bytes fed to zlib per inner step


def _gzip_members(content: bytes) -> Iterator[bytes | dict]:
    """Decompress a (possibly multi-member) gzip blob one MEMBER at a
    time — ``zlib.decompressobj`` + ``unused_data`` — so peak memory
    is one member, not the whole segment. Yields ``bytes`` per member
    and one ``{"error": str}`` dict (then stops) on truncation or
    corruption: the remaining tail cannot be located reliably once a
    member is bad, so it quarantines as a unit (pre-r9 lost the whole
    file instead).

    Input is fed in bounded chunks (``_GZ_CHUNK``), advancing by
    bytes actually consumed: feeding the whole remaining tail per
    member makes zlib copy the unconsumed tail into ``unused_data``
    at EVERY member boundary — O(members × file_size), hours on a
    real Common-Crawl segment (~100k small members per ~1 GB file).
    Chunk-bounding keeps the per-boundary copy ≤ one chunk, i.e.
    linear total time (pytest pins a many-member wall-clock bound)."""
    mv = memoryview(content)
    pos, n = 0, len(content)
    while pos < n:
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        start = pos
        parts = []
        while True:
            chunk = mv[pos:pos + _GZ_CHUNK]
            try:
                parts.append(d.decompress(chunk))
            except zlib.error as ex:
                yield {"error": f"gzip decompression failed at byte {start}: {ex}"}
                return
            if d.eof:
                # member ended inside this chunk: unused_data is the
                # (chunk-bounded) leftover — advance by what was eaten
                pos += len(chunk) - len(d.unused_data)
                break
            pos += len(chunk)
            if pos >= n:
                yield {"error": "gzip decompression failed: truncated gzip member"}
                return
        yield b"".join(parts)
        if pos <= start:  # paranoid: a no-progress member would spin
            yield {"error": "gzip decompression failed: empty member"}
            return


def parse_warc_members(content: bytes) -> Iterator[dict]:
    """All records in one .warc or .warc.gz blob. Yields
    ``{"headers": {...}, "body": bytes}`` per good record and
    ``{"error": str}`` for each malformed one (parsing then
    resynchronizes at the next ``WARC/`` marker). Gzip input is
    decompressed member by member and records parse incrementally out
    of a carry-over buffer — a record spanning members (nonstandard
    but legal) is completed once the next member arrives."""
    buf = bytearray()
    resyncing = False

    def drain(eof: bool) -> Iterator[dict]:
        nonlocal resyncing
        offset = 0
        n = len(buf)
        while True:
            if resyncing:
                nxt = buf.find(b"WARC/", offset)
                if nxt < 0:
                    # keep a 4-byte tail: the marker may straddle the
                    # member boundary ("WARC" then "/...")
                    offset = max(offset, n - 4) if not eof else n
                    break
                offset = nxt
                resyncing = False
            while offset < n and buf[offset:offset + 2] == _CRLF:
                offset += 2
            if offset >= n:
                break
            try:
                rec, offset = _parse_one(buf, offset)
            except _Truncated as ex:
                if not eof:
                    break  # wait for the next member; keep from offset
                yield {"error": str(ex)}
                resyncing = True
                offset += 1
                continue
            except ValueError as ex:
                yield {"error": str(ex)}
                resyncing = True
                offset += 1
                continue
            yield rec
        del buf[:offset]

    if content[:2] == b"\x1f\x8b":
        for member in _gzip_members(content):
            if isinstance(member, dict):
                yield from drain(eof=True)  # flush what parsed cleanly
                yield member
                return
            buf += member
            yield from drain(eof=False)
        yield from drain(eof=True)
    else:
        buf += content
        yield from drain(eof=True)


# charset label in a Content-Type parameter ('; charset=utf-8') or an
# HTML <meta charset> / <meta http-equiv="Content-Type" content="...;
# charset=..."> probe ([^>]+ spans the attributes in between)
_CT_CHARSET_RE = _re.compile(r'charset\s*=\s*["\']?\s*([A-Za-z0-9_\-]+)', _re.I)
_META_CHARSET_RE = _re.compile(
    rb'<meta[^>]+charset\s*=\s*["\']?\s*([A-Za-z0-9_\-]+)', _re.I
)


def _decode_payload(payload: bytes, http_ct: str | None) -> str:
    """Charset-sniffed text decode (r9): the declared HTTP charset
    parameter wins (decoded with replacement — the declaration is
    authoritative even over stray bad bytes), else an HTML meta probe
    over the first 1024 bytes, else strict UTF-8, else latin-1 (total:
    every byte value is a valid code point, so the chain always
    lands). Unknown/bogus charset labels fall through to the
    UTF-8→latin-1 tail instead of raising."""
    enc = None
    if http_ct:
        m = _CT_CHARSET_RE.search(http_ct)
        if m:
            enc = m.group(1)
    if enc is None:
        m = _META_CHARSET_RE.search(payload[:1024])
        if m:
            enc = m.group(1).decode("ascii", "replace")
    if enc is not None:
        try:
            return payload.decode(enc, "replace")
        except LookupError:
            pass  # unknown codec label → sniff-free fallback chain
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("latin-1")


def _http_split(body: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, payload) from an HTTP response block."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0 or not body.startswith(b"HTTP/"):
        return None, None, body
    head = body[:sep].decode("utf-8", "replace")
    lines = head.split("\r\n")
    status = None
    parts = lines[0].split(" ")
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, body[sep + 4:]


WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("n_payload_bytes", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("parse_error", T.StringType()),
    ]
)


def warc_records(files: DataFrame) -> DataFrame:
    """(path, content binary) — e.g. ``spark.read.format("binaryFile")
    .load("…/*.warc.gz")`` — exploded to one row per WARC record with
    the schema in ``WARC_SCHEMA``. Response records with a text-ish
    HTTP payload get ``text`` (UTF-8, replacement); malformed records
    become quarantine rows with ``parse_error`` set."""
    import pandas as pd

    cols = [f.name for f in WARC_SCHEMA.fields]
    # flush every N records: with member-by-member decompression the
    # peak executor memory is one gzip member + one output chunk —
    # never the whole decoded ~1 GB segment (r9, ADVICE)
    chunk_rows = 4096

    def explode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in parse_warc_members(bytes(content)):
                    if "error" in rec:
                        rows.append(
                            {"path": path, "parse_error": rec["error"]}
                        )
                        continue
                    h = rec["headers"]
                    body = rec["body"]
                    ctype = h.get("content-type", "")
                    status = http_ct = text = None
                    n_payload = len(body)
                    if "msgtype=response" in ctype.replace(" ", ""):
                        status, http_ct, payload = _http_split(body)
                        n_payload = len(payload)
                        if http_ct and (
                            http_ct.startswith("text/") or "html" in http_ct
                        ):
                            text = _decode_payload(payload, http_ct)
                    rows.append(
                        {
                            "path": path,
                            "record_id": h.get("warc-record-id"),
                            "warc_type": h.get("warc-type"),
                            "target_uri": h.get("warc-target-uri"),
                            "warc_date": h.get("warc-date"),
                            "content_type": ctype,
                            "http_status": status,
                            "http_content_type": http_ct,
                            "n_payload_bytes": n_payload,
                            "text": text,
                            "parse_error": None,
                        }
                    )
                    if len(rows) >= chunk_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(explode, WARC_SCHEMA)


def warc_to_documents(
    files: DataFrame, extract_text: bool = True, keep_raw: bool = False
) -> DataFrame:
    """WARC crawl files → the pipeline's ``documents`` shape
    (doc_id, text, lang, source, target_uri, warc_date): keep
    text-decoded HTTP responses, run HTML payloads through
    :func:`llm_ops.html.html_to_text` (r9 — every downstream judge:
    the quality gate's alpha ratio, lang_id's stopwords, dedup
    shingles, BPE training now sees PROSE, not markup; non-HTML
    ``text/*`` payloads pass through unchanged), derive the source
    from the URI host (the unit source_reputation_filter judges) and
    a language tag from the shared stopword heuristic — computed on
    the EXTRACTED text. The output feeds ``build_training_corpus``
    directly — the Common-Crawl → training-corpus path end to end.

    ``doc_id`` is the WARC-Record-ID string verbatim (a unique
    urn:uuid per record by spec): at real crawl scale (~3B response
    records) a 64-bit hash id expects birthday collisions that would
    silently merge distinct documents in downstream dedup /
    decontamination joins (r8 ADVICE), so no hash. ``extract_text=
    False`` preserves the pre-r9 raw-markup behavior; ``keep_raw``
    adds the charset-decoded but UNextracted payload text as a
    ``raw_html`` column (markup intact)."""
    from pyspark.sql import functions as F

    from .html import html_to_text
    from .text import lang_id

    recs = warc_records(files)
    base = recs.filter(
        F.col("parse_error").isNull()
        & (F.col("warc_type") == "response")
        & F.col("text").isNotNull()
    )
    is_html = F.lower(F.coalesce("http_content_type", F.lit(""))).contains(
        "html"
    )
    text_out = (
        F.when(is_html, html_to_text(F.col("text"))).otherwise(F.col("text"))
        if extract_text
        else F.col("text")
    )
    out_cols = [
        F.col("record_id").alias("doc_id"),
        text_out.alias("text"),
        lang_id(text_out).alias("lang"),
        F.regexp_extract("target_uri", "^[a-z]+://([^/]+)", 1).alias(
            "source"
        ),
        "target_uri",
        "warc_date",
    ]
    if keep_raw:
        out_cols.append(F.col("text").alias("raw_html"))
    return base.select(*out_cols)
