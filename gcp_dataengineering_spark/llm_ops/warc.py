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

Honest limits (same discipline as the multimodal stubs): HTTP
payload decoding assumes UTF-8 with replacement (real charset
sniffing needs libs absent from this container) and only
``text/*`` / ``*html*`` payloads are decoded; everything else
reports metadata with a NULL body.
"""

from __future__ import annotations

import gzip
import io
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


def _parse_one(buf: bytes, offset: int) -> tuple[dict | None, int]:
    """Parse one record starting at ``offset``; returns (record,
    next_offset) or (None, len) at end. Raises ValueError on a
    malformed record (caller quarantines)."""
    n = len(buf)
    while offset < n and buf[offset:offset + 2] == _CRLF:
        offset += 2
    if offset >= n:
        return None, n
    line_end = buf.find(_CRLF, offset)
    if line_end < 0 or not buf[offset:line_end].startswith(b"WARC/"):
        raise ValueError(f"expected WARC version line at byte {offset}")
    headers: dict[str, str] = {}
    pos = line_end + 2
    while True:
        line_end = buf.find(_CRLF, pos)
        if line_end < 0:
            raise ValueError("unterminated WARC header block")
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
        raise ValueError("record body truncated")
    body = buf[pos:pos + length]
    return {"headers": headers, "body": body}, pos + length


def parse_warc_members(content: bytes) -> Iterator[dict]:
    """All records in one .warc or .warc.gz blob (multi-member gzip
    handled). Yields ``{"headers": {...}, "body": bytes}`` per good
    record and ``{"error": str}`` for each malformed one (parsing
    then resynchronizes at the next ``WARC/`` marker)."""
    if content[:2] == b"\x1f\x8b":
        # standard record-per-member layout: GzipFile reads ALL
        # members of a multi-member stream. A truncated/corrupt
        # segment must QUARANTINE (the module contract), not kill the
        # task — gzip raises EOFError / BadGzipFile / zlib errors.
        try:
            content = gzip.GzipFile(fileobj=io.BytesIO(content)).read()
        except Exception as ex:  # noqa: BLE001 — gzip/zlib error zoo
            yield {"error": f"gzip decompression failed: {ex}"}
            return
    offset = 0
    n = len(content)
    while offset < n:
        # position offset AT the next record start before parsing, so
        # a failure resynchronizes past THIS record (not a retry of it)
        while offset < n and content[offset:offset + 2] == _CRLF:
            offset += 2
        if offset >= n:
            return
        try:
            rec, offset = _parse_one(content, offset)
        except ValueError as ex:
            yield {"error": str(ex)}
            nxt = content.find(b"WARC/", offset + 1)
            if nxt < 0:
                return
            offset = nxt
            continue
        if rec is None:
            return
        yield rec


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

    def explode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                # one output frame per FILE, not per Arrow batch: a
                # batch can hold several ~1 GB segments, and buffering
                # every decoded record of all of them at once is an
                # executor OOM at exactly the scale this targets
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
                            text = payload.decode("utf-8", "replace")
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
                yield pd.DataFrame(
                    rows, columns=[f.name for f in WARC_SCHEMA.fields]
                )

    return files.select("path", "content").mapInPandas(explode, WARC_SCHEMA)


def warc_to_documents(files: DataFrame) -> DataFrame:
    """WARC crawl files → the pipeline's ``documents`` shape
    (doc_id, text, lang, source, target_uri, warc_date): keep
    text-decoded HTTP responses, derive a stable doc_id from the
    record id (xxhash64 — deterministic across re-reads), the source
    from the URI host (the unit source_reputation_filter judges),
    and a language tag from the shared n-gram heuristic. The output
    feeds ``build_training_corpus`` directly — the Common-Crawl →
    training-corpus path end to end."""
    from pyspark.sql import functions as F

    from .text import lang_id

    recs = warc_records(files)
    return (
        recs.filter(
            F.col("parse_error").isNull()
            & (F.col("warc_type") == "response")
            & F.col("text").isNotNull()
        )
        .select(
            F.xxhash64("record_id").alias("doc_id"),
            "text",
            lang_id(F.col("text")).alias("lang"),
            F.regexp_extract("target_uri", "^[a-z]+://([^/]+)", 1).alias(
                "source"
            ),
            "target_uri",
            "warc_date",
        )
    )
