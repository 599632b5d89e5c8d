"""Document-format ingestion router (r18): one operator that takes a
crawl's raw BINARY payloads and produces text documents, routing
each payload to the right extractor —

- ``%PDF-`` magic → the vendored PDF parser (llm_ops/pdf.py,
  mapInPandas leg);
- HTML (a case-insensitive ``<!doctype``/``<html``/``<head``/
  ``<body``/``<div``/``<p>`` signal in the head of the decoded
  text) → the column-expression HTML extractor (llm_ops/html.py,
  pure codegen leg);
- clean UTF-8 with none of the above → plain text, as-is;
- anything else (undecodable bytes, NULs) → quarantined
  ``binary-unknown``, keeping its row.

This is the missing first stage of a real training-data pipeline:
WARC/crawl payloads are bytes, not text, and feeding markup or PDF
byte soup into the quality gate / lang_id / dedup shingles judges
garbage (the r8 html lesson, format-general this time).

Scale shape: the HTML/text legs are pure column expressions (scan
speed, no Python); only true PDFs enter the Arrow UDF leg. The
router filters the source twice (PDF leg + everything else), so the
input is a documented branch point — pass ``materialize`` when the
upstream lineage is expensive (the repo-wide rule).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .html import html_to_text
from .pdf import pdf_text_extract, synth_pdf_payload

__all__ = [
    "extract_documents", "synth_doc_corpus", "synth_doc_payload",
    "DOC_FORMAT_SCHEMA",
]

DOC_FORMAT_SCHEMA = (
    "format string, ok boolean, err string, title string, "
    "n_pages int, text string"
)

# case-insensitive HTML signal, anchored to the HEAD of the payload
# (first 1024 chars): a doctype, or an opening html/head/body/div/p
# tag. Java-regex ∩ RE2 dialect, same as the html module.
_HTML_HEAD_RE = (
    "(?is)^.{0,1024}?(<!doctype\\s|<html[\\s>]|<head[\\s>]|"
    "<body[\\s>]|<div[\\s>]|<p[\\s>])"
)


def _is_pdf(payload: Column) -> Column:
    # the 5-byte magic; binary substring works JVM-side. NULL-safe:
    # a NULL payload must fall through to the quarantine leg, not
    # evaluate both route filters to NULL and vanish from the output
    return (F.substring(payload, 1, 5) == F.lit(b"%PDF-")).eqNullSafe(
        F.lit(True)
    )


def extract_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    batch_rows: int = 256,
) -> DataFrame:
    """(id, format, ok, err, title, n_pages, text) for a binary
    payload column: PDFs through the vendored parser, HTML through
    the codegen extractor, clean UTF-8 as plain text, the rest
    quarantined. ``title``/``n_pages`` are PDF-only (NULL
    elsewhere); every input row keeps exactly one output row."""
    payload = F.col(payload_col)

    pdf_leg = (
        df.filter(_is_pdf(payload))
        .select(F.col(id_col).alias("media_id"), payload.alias("payload"))
    )
    pdf_out = pdf_text_extract(
        pdf_leg, id_col="media_id", payload_col="payload",
        batch_rows=batch_rows,
    ).select(
        F.col("media_id").alias(id_col),
        F.lit("pdf").alias("format"),
        "ok", "err", "title", "n_pages", "text",
    )

    # non-PDF: a binary→string cast is a raw byte copy in Spark (no
    # validation, never throws — `decode` in Spark 4 errors on
    # malformed input); `is_valid_utf8` is the explicit validity
    # check that gates the text legs
    decoded = payload.cast("string")
    bad = (
        payload.isNull()
        | F.length(payload).eqNullSafe(0)
        | ~F.expr(f"is_valid_utf8(cast({payload_col} as string))")
        | decoded.contains("\x00")
    )
    is_html = decoded.rlike(_HTML_HEAD_RE)
    rest = df.filter(~_is_pdf(payload)).select(
        F.col(id_col),
        F.when(bad, F.lit("binary")).otherwise(
            F.when(is_html, F.lit("html")).otherwise(F.lit("text"))
        ).alias("format"),
        (~bad).alias("ok"),
        F.when(bad, F.lit("binary-unknown")).alias("err"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("int").alias("n_pages"),
        F.when(bad, F.lit(None).cast("string")).otherwise(
            F.when(is_html, html_to_text(decoded)).otherwise(decoded)
        ).alias("text"),
    )
    return pdf_out.unionByName(rest)


# ------------------------------------------------------------------
# deterministic fixture corpus (the oracle-side closed forms)
# ------------------------------------------------------------------

def _html_fixture(doc_id: int) -> str:
    """Closed-form HTML page — the SQL oracle rebuilds this exact
    string and feeds it through html_text_sql."""
    return (
        f"<html><head><title>T{doc_id}</title>"
        f"<script>var x={doc_id};</script></head>"
        f"<body><p>para {doc_id} one &amp; two</p>"
        f"<div>div {doc_id}</div></body></html>"
    )


def synth_doc_payload(doc_id: int) -> bytes:
    """Deterministic mixed-format payload per id, cycling by
    doc_id % 4: a real PDF (pdf.synth_pdf_payload — its own variant
    cycle rides along, so the quarantine legs are exercised too), a
    closed-form HTML page, plain UTF-8 text, invalid bytes."""
    kind = doc_id % 4
    if kind == 0:
        return synth_pdf_payload(doc_id)
    if kind == 1:
        return _html_fixture(doc_id).encode("utf-8")
    if kind == 2:
        return f"plain text doc {doc_id} café r{doc_id % 5}".encode(
            "utf-8"
        )
    return b"\xff\xfe\x00" + bytes([doc_id % 251]) * 4


def synth_doc_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) with a deterministic mixed-format payload
    per id — the fixture generator for the router oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids.values,
                    "payload": [synth_doc_payload(int(i)) for i in ids],
                }
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, payload binary"
    )
