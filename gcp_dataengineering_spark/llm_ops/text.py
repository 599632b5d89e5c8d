"""Text analysis operators: tokenization, quality scoring,
language-ID heuristic, document fingerprinting.

All pure built-in-expression implementations (whole-stage codegen,
no Python in the hot path) — at 100 TB these run at scan speed with
full column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word splitter: runs of non-alphanumerics separate tokens.
TOKEN_SPLIT_RE = "[^a-zA-Z0-9]+"

# Tiny embedded stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ist"],
}


def md5_60bit(c: Column) -> Column:
    """First 60 bits of md5(c) as a BIGINT — the engine-portable
    numeric hash used by the minhash family and dataset splitting.
    DuckDB spells the identical value
    ``('0x' || substring(md5(x), 1, 15))::BIGINT``. Numeric (not hex
    string) so aggregations stay HashAggregate and shuffles carry
    8 bytes."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")


def tokens(col: Column | str, pattern: str = TOKEN_SPLIT_RE) -> Column:
    """Regex tokenization → array<string> (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace/BPE-ish token count."""
    return F.size(tokens(col))


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, "\\s+"), lambda t: t != ""))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.length(stripped).cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_hits(col: Column | str, words: list[str]) -> Column:
    """How many of `words` appear as whitespace-delimited tokens.
    Uses padded LIKE matches — one codegen'd expression, no explode."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    hit = None
    for w in words:
        h = F.when(padded.like(f"% {w} %"), 1).otherwise(0)
        hit = h if hit is None else hit + h
    return hit if hit is not None else F.lit(0)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, punctuation
    ratio, English-stopword ratio. The downstream filter policy
    (drop too-short / too-punctuated / stopword-free docs) is a
    plain .filter over these columns."""
    t = F.col(text_col)
    n_tok = whitespace_token_count(t)
    return (
        df.withColumn("n_chars_calc", F.length(t).cast("long"))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn(
            "avg_token_len",
            (F.length(F.regexp_replace(t, "\\s+", "")).cast("double"))
            / F.greatest(n_tok, F.lit(1)).cast("double"),
        )
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn(
            "stopword_ratio",
            stopword_hits(t, STOPWORDS["en"]).cast("double") / F.lit(len(STOPWORDS["en"])),
        )
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Stopword-hit score per language (n-gram heuristic)."""
    return {lang: stopword_hits(col, words) for lang, words in STOPWORDS.items()}


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Pick the language with the highest stopword score — a
    first-match-wins when-chain (ties resolve to STOPWORDS order;
    zero hits → `default`). No shuffle, no UDF."""
    scores = lang_scores(col)
    langs = list(scores)
    best = None
    for i, lang in enumerate(langs):
        cond = scores[lang] > 0
        for later in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[later])
        expr = F.when(cond, lang)
        best = expr if best is None else best.when(cond, lang)
    return best.otherwise(default) if best is not None else F.lit(default)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. (Content-defined rolling
    hashes are only needed for partial-overlap detection; for whole-
    doc identity a strong hash is the right primitive at scale —
    fixed 32-byte shuffle key instead of the full text.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), "\\s+", " ")).cast("binary"))
