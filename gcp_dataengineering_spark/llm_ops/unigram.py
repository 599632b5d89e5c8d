"""Unigram-LM (SentencePiece-style) tokenizer (r13 — the r12
verdict's missing second tokenizer family next to BPE): a
subword vocabulary learned by fixed-iteration EM over candidate
pieces, and Viterbi segmentation under the learned piece scores.

The ORACLE-GATED trainer is the HARD-EM (Viterbi-EM) variant of
Kudo 2018's unigram language model, chosen deliberately and
documented as such: the E-step segments every distinct word with
the CURRENT scores (one best segmentation per word, not expected
fractional counts), the M-step re-estimates scores from the segment
counts, and a deterministic prune keeps the vocabulary at size.
Hard EM is the standard tractable variant when exact cross-engine
determinism matters — expected-count EM needs float
forward-backward sums whose reduction order differs across engines,
while every quantity here is INTEGER. (r14 adds
:func:`unigram_train_soft`, the expected-count float variant with a
pinned fold-order/micro-rounding determinism contract, pytest-gated
against its python twin rather than a SQL oracle — see the variant
matrix above its definition.) The integer contract:

- piece scores are fixed-point log-probabilities
  ``llog2(count + 1) − llog2(total + V)`` (quality_model.llog2 — the
  repo's engine-exact integer log2), so Viterbi comparisons are
  BIGINT comparisons;
- the Viterbi tie-break is total score, then LONGER-LAST-PIECE
  (smaller last boundary), applied at every DP step. Because every
  optimal path decomposes into optimal prefixes, this equals
  picking, among max-score paths, the lexicographically SMALLEST
  reversed boundary sequence — a total order a SQL oracle can
  replay by ``ORDER BY score DESC, boundaries_reversed ASC``;
- pruning is rank-by-(count DESC, piece ASC) — no RNG anywhere.

Scale shape (100 TB): everything runs over the DISTINCT-WORD table
(the BPE trainer's shape — corpus scale only touches the initial
word count and the final doc re-assembly). Candidate generation is
one explode of O(len·max_piece_len) substrings per distinct word;
the Viterbi DP is a bounded higher-order fold over each word's own
edge array (collected per word — a word's edges are dimension-sized,
≤ len·L), so segmentation is a pure row map after one broadcast
join of the piece table. EM iterations are a fixed, small driver
loop (each iteration one distributed join+agg chain), with
materialization per round like the BPE/CC loops.

Reference scope note: the reference engine has no tokenizer surface
— this module exists for the training-data path beside
llm_ops/bpe.py, reproducing the PUBLIC unigram-LM algorithm from
first principles (Kudo 2018, arXiv:1804.10959).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .materialize import MaterializeFn
from .materialize import materialize as _materialize
from .quality_model import FRAC_BITS, llog2, llog2_py

__all__ = [
    "MICRO", "UNK_SCORE", "WORD_PATTERN", "unigram_train",
    "unigram_train_soft", "unigram_encode_words", "unigram_encode_docs",
    "unigram_decode_pieces",
    "unigram_sample_words", "unigram_sample_words_py",
    "unigram_sample_docs",
    "unigram_train_py", "unigram_train_soft_py", "viterbi_py",
]

# the repo's BPE/suite word convention: lowercase alpha runs
WORD_PATTERN = "[^a-z]+"

# score charged to an out-of-vocabulary single character at encode
# time: -100 log2 units in the fixed point — worse than any real
# piece (a piece can cost at most ~llog2(total+V) ≈ 62·2^16), so OOV
# chars never beat in-vocab segmentations, but every word stays
# segmentable
UNK_SCORE = -100 << FRAC_BITS

# DP sentinel for unreachable positions — far below any real path
# score, never accumulated (unreachable predecessors are filtered)
_NEG_INF = -(1 << 62)


def _words_with_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, n) distinct-word table — corpus scale touches only
    this one explode + count."""
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), WORD_PATTERN),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _substring_candidates(
    words: DataFrame, max_piece_len: int
) -> DataFrame:
    """(piece, cnt): every substring of length 1..L of every distinct
    word, weighted by the word's corpus count — the seed candidate
    table. One explode; the per-row blowup is bounded by len·L."""
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length("word") - i + 1
                    ),
                ),
                lambda l: F.substring(F.col("word"), i, l),
            ),
        )
    )
    return (
        words.select(F.col("n"), F.explode(spans).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def _prune(cands: DataFrame, vocab_size: int) -> DataFrame:
    """Deterministic prune: top ``vocab_size`` by (cnt DESC, piece
    ASC), plus EVERY single-character piece (coverage guarantee —
    any training word stays segmentable). The rank window is over
    the candidate table (vocab-sized), never the corpus."""
    w = Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    ranked = cands.withColumn("_rk", F.row_number().over(w))
    return ranked.filter(
        (F.col("_rk") <= vocab_size) | (F.length("piece") == 1)
    ).drop("_rk")


def _with_scores(pieces: DataFrame, frac_bits: int = FRAC_BITS) -> DataFrame:
    """score = llog2(cnt + 1) − llog2(T + V): Laplace-smoothed
    fixed-point log-probability; T and V ride in via one windowed
    sum over the piece table (vocab-sized)."""
    wall = Window.partitionBy()
    t = F.sum("cnt").over(wall)
    v = F.count(F.lit(1)).over(wall)
    return pieces.withColumn(
        "score", llog2(F.col("cnt") + 1, frac_bits) - llog2(t + v, frac_bits)
    )


def _word_spans(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(word, n, i, j, p) — every candidate span of length 1..L of
    every distinct word; one explode, blowup bounded by len·L."""
    return words.select(
        "word",
        "n",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda l: F.struct(
                            (i - 1).cast("int").alias("i"),
                            (i - 1 + l).cast("int").alias("j"),
                            F.substring(F.col("word"), i, l).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("e"),
    ).select(
        "word", "n",
        F.col("e.i").alias("i"), F.col("e.j").alias("j"),
        F.col("e.p").alias("p"),
    )


def _segment_words(
    words: DataFrame,
    pieces: DataFrame,
    max_piece_len: int,
) -> DataFrame:
    """(word, n, pieces array<string>) — Viterbi-best segmentation of
    every distinct word under the scored piece table.

    Shape: explode each word's O(len·L) candidate spans, BROADCAST-
    join the piece table for scores (single-char spans keep an OOV
    fallback edge at UNK_SCORE so every word segments), collect the
    word's edges into ONE array, then run the DP as a bounded
    higher-order fold — dp grows position by position, each step
    reading its predecessors from the accumulator. Pure expression
    after the one broadcast join; no per-row Python."""
    spans = _word_spans(words, max_piece_len)
    scored = spans.join(
        F.broadcast(pieces.select(F.col("piece").alias("p"), "score")),
        "p",
        "left",
    ).withColumn(
        "s",
        F.coalesce(
            F.col("score"),
            # OOV fallback exists ONLY for single characters — an
            # unmatched longer span is simply not an edge
            F.when(F.col("j") - F.col("i") == 1, F.lit(UNK_SCORE)),
        ),
    ).filter(F.col("s").isNotNull())
    edges = scored.groupBy("word", "n").agg(
        F.collect_list(F.struct("i", "j", "p", "s")).alias("_edges")
    )

    # ---- the DP fold -------------------------------------------
    # acc: array of structs (sc, bp) for positions 0..step-1;
    # step j appends dp[j] = max over edges e with e.j == j of
    # (dp[e.i].sc + e.s, tie → smaller e.i), reading dp[e.i] from
    # the accumulator. Unreachable = (_NEG_INF, -1) — filtered out
    # of candidate predecessors.
    edges_col = F.col("_edges")
    dp0 = F.array(
        F.struct(
            F.lit(0).cast("long").alias("sc"), F.lit(-1).cast("int").alias("bp")
        )
    )

    def step(acc: Column, j: Column) -> Column:
        cands = F.filter(
            edges_col,
            lambda e: (e["j"] == j)
            & (F.element_at(acc, e["i"] + 1)["sc"] > F.lit(_NEG_INF)),
        )
        best = F.array_max(
            F.transform(
                cands,
                lambda e: F.struct(
                    (F.element_at(acc, e["i"] + 1)["sc"] + e["s"]).alias("sc"),
                    (-e["i"]).cast("int").alias("negi"),
                ),
            )
        )
        new = F.when(
            F.size(cands) > 0,
            F.struct(
                best["sc"].alias("sc"), (-best["negi"]).cast("int").alias("bp")
            ),
        ).otherwise(
            F.struct(
                F.lit(_NEG_INF).cast("long").alias("sc"),
                F.lit(-1).cast("int").alias("bp"),
            )
        )
        return F.concat(acc, F.array(new))

    # materialize dp as a REAL projected column before the backtrace
    # references it per step — an inline expression would re-run the
    # whole DP once per backtrace iteration (the measured CSE trap)
    with_dp = edges.withColumn(
        "_dp", F.aggregate(F.sequence(F.lit(1), F.length("word")), dp0, step)
    )

    # ---- backtrace ---------------------------------------------
    # walk bp from position len down to 0, emitting pieces in
    # REVERSE; len iterations bound the walk (each step moves left
    # by ≥ 1). acc: struct(pos, parts array<string>).
    def back(acc: Column, _: Column) -> Column:
        pos = acc["pos"]
        bp = F.element_at(F.col("_dp"), pos + 1)["bp"]
        piece = F.col("word").substr(bp + 1, pos - bp)
        return F.when(
            pos > 0,
            F.struct(
                bp.alias("pos"),
                F.concat(acc["parts"], F.array(piece)).alias("parts"),
            ),
        ).otherwise(acc)

    walk = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.struct(
            F.length("word").cast("int").alias("pos"),
            F.array().cast("array<string>").alias("parts"),
        ),
        back,
    )
    return with_dp.select(
        "word", "n", F.reverse(walk["parts"]).alias("pieces")
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 2000,
    max_piece_len: int = 6,
    em_iters: int = 1,
    materialize: str | MaterializeFn | bool | None = None,
) -> DataFrame:
    """Learn the unigram-LM piece table: seed (substring counts →
    prune → scores), then ``em_iters`` hard-EM rounds (Viterbi
    segment distinct words → piece counts weighted by word counts →
    re-score → prune). Returns (piece, cnt, score, piece_id) with
    ``piece_id`` the stable rank by (cnt DESC, piece ASC).

    The driver loop is ``em_iters`` long (fixed, small); each round
    is one distributed join+agg chain, materialized per round like
    the BPE/CC loops so the lineage never compounds."""
    words = _materialize(_words_with_counts(docs, text_col), materialize)
    pieces = _with_scores(
        _prune(_substring_candidates(words, max_piece_len), vocab_size)
    )
    for _ in range(em_iters):
        pieces = _materialize(pieces, materialize)
        seg = _segment_words(words, pieces, max_piece_len)
        counts = (
            seg.select(
                "n", F.explode(F.col("pieces")).alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("n").cast("long").alias("cnt"))
        )
        # coverage: single chars survive even at zero count (they may
        # have been out-segmented this round but a future word needs
        # them) — union the char rows back at cnt 0 if they vanished
        chars = (
            pieces.filter(F.length("piece") == 1)
            .select("piece")
            .join(counts, "piece", "left_anti")
            .withColumn("cnt", F.lit(0).cast("long"))
        )
        pieces = _with_scores(
            _prune(counts.unionByName(chars), vocab_size)
        )
    # Pin the FINAL table too (r19): the loop only materialized each
    # round's INPUT, so the returned vocab's lineage still carried the
    # last E-step — and the doc encoders broadcast the vocab twice
    # (scores for the Viterbi, ids for the attach), re-running that
    # corpus-scale segmentation once per broadcast. One vocab-sized
    # checkpoint buys single evaluation for every downstream consumer.
    ranked = _materialize(pieces, materialize).withColumn(
        "piece_id",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
        ).cast("int"),
    )
    return ranked.select("piece", "cnt", "score", "piece_id")


def unigram_encode_words(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 6,
    byte_fallback: bool = False,
) -> DataFrame:
    """(word, n, pieces, piece_ids) under a trained vocab —
    segmentation via the same Viterbi fold; ids resolved by ONE more
    broadcast join at the piece level (OOV chars get id NULL).
    ``byte_fallback=True`` (r18): the SentencePiece deployment
    standard instead of NULL — see :func:`_attach_piece_ids`."""
    return _attach_piece_ids(
        _segment_words(words, vocab, max_piece_len), vocab,
        byte_fallback=byte_fallback,
    )


def _byte_expansion(piece: Column) -> Column:
    """A string piece → its SentencePiece byte-piece expansion:
    array<struct(sub, piece, piece_id)> with one ``<0xNN>`` entry per
    UTF-8 byte (uppercase zero-padded hex — the SentencePiece
    spelling) and the RESERVED id ``-(byte + 1)`` (negative = the
    byte space, disjoint from the rank ids, stable under any vocab
    size). Pure codegen: encode → per-byte binary substring → hex;
    no lookup table, no UDF."""
    bin_ = F.encode(piece, "UTF-8")
    return F.transform(
        F.sequence(F.lit(1), F.length(bin_)),
        lambda i: F.struct(
            i.cast("int").alias("sub"),
            F.concat(
                F.lit("<0x"), F.hex(F.substring(bin_, i, F.lit(1))), F.lit(">")
            ).alias("piece"),
            (
                -(F.conv(F.hex(F.substring(bin_, i, F.lit(1))), 16, 10)
                  .cast("int") + 1)
            ).alias("piece_id"),
        ),
    )


def _attach_piece_ids(
    seg: DataFrame, vocab: DataFrame, byte_fallback: bool = False
) -> DataFrame:
    """(word, n, pieces) → + piece_ids via one broadcast vocab join
    (OOV pieces get id NULL) — shared by the Viterbi and sampled
    encoders.

    ``byte_fallback=True`` (r18 — the r17 verdict's item 5): the
    SentencePiece byte-fallback standard. A piece the vocab doesn't
    know (the Viterbi's UNK_SCORE single-char edges) expands into
    its UTF-8 bytes as reserved ``<0xNN>`` pieces with ids
    ``-(byte+1)`` instead of riding as a NULL-id OOV — so ANY input
    word round-trips losslessly (:func:`unigram_decode_pieces`
    inverts). In-vocab segmentation is byte-identical to the
    fallback-off twin (the expansion only ever touches NULL-id
    pieces), pinned by pytest. Mirrors ``bpe_encode_docs``'s
    byte-level contract at the piece level; vocab scores are
    unchanged (fallback is an ENCODE-time representation, not a
    training change — documented delta from SentencePiece, which
    also trains the byte pieces)."""
    exploded = seg.select(
        "word", "n", F.posexplode("pieces").alias("ord", "piece")
    ).join(
        F.broadcast(vocab.select("piece", "piece_id")), "piece", "left"
    )
    if not byte_fallback:
        return (
            exploded.groupBy("word", "n")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("ord", "piece", "piece_id"))
                ).alias("_z")
            )
            .select(
                "word",
                "n",
                F.transform(F.col("_z"), lambda z: z["piece"]).alias("pieces"),
                F.transform(F.col("_z"), lambda z: z["piece_id"]).alias(
                    "piece_ids"
                ),
            )
        )
    parts = F.when(
        F.col("piece_id").isNotNull(),
        F.array(
            F.struct(
                F.lit(1).cast("int").alias("sub"),
                F.col("piece").alias("piece"),
                F.col("piece_id").alias("piece_id"),
            )
        ),
    ).otherwise(_byte_expansion(F.col("piece")))
    return (
        exploded.select("word", "n", "ord", parts.alias("_parts"))
        .groupBy("word", "n")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ord", "_parts"))
            ).alias("_z")
        )
        .select(
            "word",
            "n",
            F.flatten(
                F.transform(
                    F.col("_z"),
                    lambda z: F.transform(z["_parts"], lambda p: p["piece"]),
                )
            ).alias("pieces"),
            F.flatten(
                F.transform(
                    F.col("_z"),
                    lambda z: F.transform(
                        z["_parts"], lambda p: p["piece_id"]
                    ),
                )
            ).alias("piece_ids"),
        )
    )


def _token_array(
    text_col: str,
    word_pattern: str = WORD_PATTERN,
    lower: bool = True,
    max_word_len: int | None = None,
) -> Column:
    """The per-doc token array expression both doc encoders split
    on — exposed separately so callers can ask row-wise questions
    about it (e.g. "is this doc tokenless?") without re-running the
    positional explode."""
    base = F.lower(F.col(text_col)) if lower else F.col(text_col)
    arr = F.filter(F.split(base, word_pattern), lambda t: t != "")
    if max_word_len is not None:
        arr = F.filter(arr, lambda t: F.length(t) <= max_word_len)
    return arr


def _doc_tokens(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    word_pattern: str = WORD_PATTERN,
    lower: bool = True,
    max_word_len: int | None = None,
) -> DataFrame:
    """(id, pos, word): the position-keyed word explode both doc
    encoders share. The classic convention (lower + ``[^a-z]+``) is
    the default; the byte-fallback doc encoder passes the
    lossless-per-word convention (case kept, whitespace split, BPE's
    straggler cap) instead."""
    return docs.select(
        F.col(id_col),
        F.posexplode(
            _token_array(text_col, word_pattern, lower, max_word_len)
        ).alias("pos", "word"),
    )


def unigram_encode_docs(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 6,
    byte_fallback: bool = False,
    max_word_len: int = 64,
) -> DataFrame:
    """(id, pieces array<string>, piece_ids array<int>, n_pieces,
    n_oov) per document: words in order, each replaced by its
    Viterbi segmentation. Distinct-word segmentation computed ONCE
    and joined back — corpus scale pays one word explode and one
    word-keyed join, never per-word DP re-runs.

    ``byte_fallback=True`` (r18 — the r17 verdict's item 5): the
    SentencePiece deployment standard. Tokenization switches to the
    lossless-per-word convention ``bpe_encode_docs(byte_level=True)``
    established (case KEPT, whitespace split, ``max_word_len``
    straggler cap — a megabyte 'word' is garbage, not language), and
    every vocab-unknown piece encodes as reserved ``<0xNN>`` byte
    pieces (ids ``-(byte+1)``) instead of a NULL-id OOV — any
    script, emoji included, round-trips word-losslessly through
    :func:`unigram_decode_pieces`. ``n_oov`` is 0 by construction
    under fallback (count negative ids for the bytes-used census).
    Default off: the classic lower + ``[^a-z]+`` path is
    byte-identical to r17."""
    tok_args = (
        dict(word_pattern=r"\s+", lower=False, max_word_len=max_word_len)
        if byte_fallback
        else {}
    )
    tokens = _doc_tokens(docs, id_col, text_col, **tok_args)
    wseg = unigram_encode_words(
        tokens.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n")),
        vocab,
        max_piece_len,
        byte_fallback=byte_fallback,
    ).select("word", "pieces", "piece_ids")
    return _assemble_docs(
        docs, tokens, wseg, id_col,
        empty_arr=_token_array(text_col, **tok_args),
        # words join on the reserved space byte piece, so the doc
        # stream decodes to the whitespace-NORMALIZED text (runs
        # collapse to one space — the same normalization the
        # fingerprint contract uses); without it the flattened
        # stream would lose the word boundaries the split consumed
        word_sep=("<0x20>", -(0x20 + 1)) if byte_fallback else None,
    )


_BYTE_PIECE_RE = re.compile(r"^<0x([0-9A-F]{2})>$")


def unigram_decode_pieces(
    pieces: list[str], piece_ids: list[int] | None = None
) -> str:
    """Python inverse of a byte-fallback encoding (tests/display):
    ``<0xNN>`` pieces contribute their byte, every other piece its
    UTF-8 bytes; the buffer decodes as UTF-8. Pass ``piece_ids`` to
    disambiguate a vocab piece that LOOKS like a byte piece (a
    literal '<0x41>' token in whitespace-split text): only negative
    ids are treated as bytes then — the reserved-id space is the
    authoritative marker, the spelling is for display."""
    buf = bytearray()
    for i, p in enumerate(pieces):
        m = _BYTE_PIECE_RE.match(p)
        is_byte = (
            piece_ids[i] is not None and piece_ids[i] < 0
            if piece_ids is not None
            else bool(m)
        )
        if is_byte and m:
            buf.append(int(m.group(1), 16))
        else:
            buf.extend(p.encode("utf-8"))
    return buf.decode("utf-8", errors="replace")


def _assemble_docs(
    docs: DataFrame,
    tokens: DataFrame,
    wseg: DataFrame,
    id_col: str,
    word_sep: tuple[str, int] | None = None,
    empty_arr: Column | None = None,
) -> DataFrame:
    """Re-assemble per-word segmentations into per-doc sequences —
    shared by the Viterbi and sampled doc encoders. ``wseg`` is
    (word, pieces, piece_ids). ``word_sep`` (piece, id) — byte
    fallback's reserved space piece — is prepended to every word
    but the first, preserving word boundaries in the flat stream.
    ``empty_arr`` (r19): the caller's token-array expression over
    ``docs`` — when given, zero-word docs are found with a row-wise
    ``size(arr) == 0`` filter on the doc scan instead of a third
    evaluation of the token explode plus an anti-join exchange
    (``tokens`` has a row iff that array is non-empty, so the two
    forms are identical by construction)."""
    joined = tokens.join(wseg, "word")

    def _flat(field: str, sep):
        if word_sep is None:
            return F.flatten(
                F.transform(F.col("_z"), lambda z: z[field])
            )
        return F.flatten(
            F.transform(
                F.col("_z"),
                lambda z, i: F.when(i == 0, z[field]).otherwise(
                    F.concat(F.array(sep), z[field])
                ),
            )
        )

    out = (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "pieces", "piece_ids"))
            ).alias("_z")
        )
        .select(
            id_col,
            _flat("pieces", F.lit(word_sep[0]) if word_sep else None).alias(
                "pieces"
            ),
            _flat(
                "piece_ids",
                F.lit(word_sep[1]).cast("int") if word_sep else None,
            ).alias("piece_ids"),
        )
        .withColumn("n_pieces", F.size("pieces"))
        .withColumn(
            "n_oov",
            F.size(F.filter(F.col("piece_ids"), lambda x: x.isNull())),
        )
    )
    # docs with zero words keep a row (empty arrays). Anti-join
    # against the TOKEN ids, not `out`: out's id set equals tokens'
    # (wseg covers every distinct word — OOV chars segment via the
    # UNK edge — so the inner join drops nothing), and referencing
    # `out` here re-ran its whole join+groupBy lineage a second time
    # just to list ids (r18). With `empty_arr` the anti-join (and the
    # third token-explode evaluation feeding it) disappears entirely
    # (r19) — one row-wise filter over the doc scan.
    base = (
        docs.filter(F.size(empty_arr) == 0).select(F.col(id_col))
        if empty_arr is not None
        else docs.select(F.col(id_col)).join(
            tokens.select(id_col), id_col, "left_anti"
        )
    )
    empties = base.select(
        F.col(id_col),
        F.array().cast("array<string>").alias("pieces"),
        F.array().cast("array<int>").alias("piece_ids"),
        F.lit(0).alias("n_pieces"),
        F.lit(0).alias("n_oov"),
    )
    return out.unionByName(empties)


# ------------------------------------------------------------------
# pure-Python twin — the independent falsification reference
# ------------------------------------------------------------------

def viterbi_py(
    word: str, scores: dict[str, int], max_piece_len: int = 6
) -> list[str]:
    """Independent Viterbi with the SAME deterministic tie-break:
    max total score, then smaller last-boundary (longer last piece),
    resolved recursively — implemented here as the plain DP."""
    n = len(word)
    dp: list[tuple[int, int]] = [(0, -1)] + [(_NEG_INF, -1)] * n
    for j in range(1, n + 1):
        best = None
        for i in range(max(0, j - max_piece_len), j):
            if dp[i][0] <= _NEG_INF:
                continue
            p = word[i:j]
            if p in scores:
                s = scores[p]
            elif j - i == 1:
                s = UNK_SCORE
            else:
                continue
            cand = (dp[i][0] + s, -i)
            if best is None or cand > best:
                best = cand
        if best is not None:
            dp[j] = (best[0], -best[1])
    parts: list[str] = []
    pos = n
    while pos > 0:
        bp = dp[pos][1]
        parts.append(word[bp:pos])
        pos = bp
    return list(reversed(parts))


def unigram_train_py(
    texts: list[str],
    vocab_size: int = 2000,
    max_piece_len: int = 6,
    em_iters: int = 1,
    frac_bits: int = FRAC_BITS,
) -> dict:
    """Pure-Python twin of :func:`unigram_train`. Returns
    {"pieces": {piece: (cnt, score, piece_id)}} for exact row-level
    comparison."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in re.split(WORD_PATTERN, (t or "").lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1

    def prune(c: dict[str, int]) -> dict[str, int]:
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        keep = {p for p, _ in ranked[:vocab_size]}
        keep |= {p for p in c if len(p) == 1}
        return {p: c[p] for p in keep}

    def scores_of(c: dict[str, int]) -> dict[str, int]:
        t = sum(c.values()) + len(c)
        return {
            p: llog2_py(v + 1, frac_bits) - llog2_py(t, frac_bits)
            for p, v in c.items()
        }

    cands: dict[str, int] = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + l]
                cands[p] = cands.get(p, 0) + n
    counts = prune(cands)
    for _ in range(em_iters):
        sc = scores_of(counts)
        newc: dict[str, int] = {}
        for w, n in wc.items():
            for p in viterbi_py(w, sc, max_piece_len):
                newc[p] = newc.get(p, 0) + n
        for p in counts:
            if len(p) == 1 and p not in newc:
                newc[p] = 0
        counts = prune(newc)
    sc = scores_of(counts)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return {
        "pieces": {
            p: (c, sc[p], i + 1) for i, (p, c) in enumerate(ranked)
        }
    }


# ------------------------------------------------------------------
# soft (expected-count) EM — the float variant (r14)
# ------------------------------------------------------------------
# WHICH VARIANT WHEN (the r13 verdict's "docstring matrix"):
#
# | concern                        | unigram_train (hard EM)  | unigram_train_soft (this) |
# |--------------------------------|--------------------------|---------------------------|
# | EM statistic                   | Viterbi best path only   | expected counts over ALL  |
# |                                |                          | segmentations (fwd-bwd)   |
# | arithmetic                     | INTEGER fixed point      | float64, micro-rounded    |
# | cross-engine replay            | bit-exact (DuckDB oracle | pytest vs python twin     |
# |                                | key `unigram_encode`)    | only — no SQL oracle      |
# | training-quality parity with   | approximation (hard EM   | the SentencePiece-family  |
# | SentencePiece                  | over-commits early)      | statistic                 |
# | when to use                    | budgets/shards that must | vocab quality matters     |
# |                                | replay identically       | more than replayability   |
#
# Determinism contract (what makes the float path still testable):
# every per-word reduction folds over the word's edge array SORTED
# by (i, j, p), so within a word the double accumulation order is
# fixed; each (word, piece) contribution is rounded to MICRO-counts
# (×1e6, floor(x+0.5)) BEFORE the cross-word aggregation, which then
# sums integers — order-free. The python twin reproduces the same
# fold order and the same rounding, so expected counts match
# EXACTLY, not approximately; only the final log2 fixed-point score
# may differ by ±1 ulp-induced unit between JVM and libm.

MICRO = 1_000_000


def _with_probs(pieces: DataFrame, micro: bool) -> DataFrame:
    """Attach Laplace-smoothed piece probability θ_p as double:
    (cnt/scale + 1) / (T/scale + V) — the float twin of
    `_with_scores` (scale = 1e6 when counts are micro-counts)."""
    wall = Window.partitionBy()
    scale = F.lit(float(MICRO)) if micro else F.lit(1.0)
    t = F.sum("cnt").over(wall).cast("double") / scale
    v = F.count(F.lit(1)).over(wall).cast("double")
    return pieces.withColumn(
        "th", (F.col("cnt").cast("double") / scale + F.lit(1.0)) / (t + v)
    )


def _expected_counts(
    words: DataFrame, pieces: DataFrame, max_piece_len: int
) -> DataFrame:
    """E-step: (piece, cnt) where cnt is the MICRO-rounded expected
    number of uses of the piece across the corpus under the current
    θ — forward-backward over each distinct word's lattice, edge
    posterior α[i]·θ·β[j]/Z, weighted by the word's corpus count and
    micro-rounded PER (word, piece) so the final per-piece sum is an
    integer aggregation (order-free; see the determinism contract).

    Scale shape: identical to the Viterbi path — one span explode
    over the DISTINCT-WORD table, one broadcast join of the piece
    table, per-word folds over a dimension-sized edge array, one
    piece-keyed integer aggregation."""
    spans = _word_spans(words, max_piece_len)
    scored = spans.join(
        F.broadcast(pieces.select(F.col("piece").alias("p"), "th")),
        "p",
        # training vocab always contains every single char (coverage
        # rule), so every word stays reachable without an OOV edge
        "inner",
    )
    edges = scored.groupBy("word", "n").agg(
        F.array_sort(
            F.collect_list(F.struct("i", "j", "p", "th"))
        ).alias("_edges")
    )

    ec, ln = F.col("_edges"), F.length("word").cast("int")

    def fwd_step(acc: Column, j: Column) -> Column:
        s = F.aggregate(
            F.filter(ec, lambda e: e["j"] == j),
            F.lit(0.0),
            lambda s2, e: s2 + F.element_at(acc, e["i"] + 1) * e["th"],
        )
        return F.concat(acc, F.array(s))

    # brev[k] = β[len − k + 1]; brev[1] = β[len] = 1. Step t fills
    # β[len − t]; every referenced β[e.j] has e.j > len − t, so it is
    # already in the accumulator.
    def bwd_step(acc: Column, t: Column) -> Column:
        s = F.aggregate(
            F.filter(ec, lambda e: e["i"] == ln - t),
            F.lit(0.0),
            lambda s2, e: s2
            + e["th"] * F.element_at(acc, ln - e["j"] + 1),
        )
        return F.concat(acc, F.array(s))

    with_ab = edges.withColumn(
        "_fw",
        F.aggregate(
            F.sequence(F.lit(1), ln), F.array(F.lit(1.0)), fwd_step
        ),
    ).withColumn(
        "_bwr",
        F.aggregate(
            F.sequence(F.lit(1), ln), F.array(F.lit(1.0)), bwd_step
        ),
    )
    # Z = β[0] = brev[len + 1] (= α[len]); bind the projected arrays
    # before the per-edge transform references them (the CSE rule)
    z = F.element_at(F.col("_bwr"), ln + 1)
    per_edge = with_ab.select(
        "word",
        "n",
        F.explode(
            F.transform(
                ec,
                lambda e: F.struct(
                    e["p"].alias("p"),
                    (
                        F.element_at(F.col("_fw"), e["i"] + 1)
                        * e["th"]
                        * F.element_at(
                            F.col("_bwr"), ln - e["j"] + 1
                        )
                        / z
                    ).alias("w"),
                ),
            )
        ).alias("ew"),
    )
    # micro-round per (word, piece): downstream sums are integer
    contrib = (
        per_edge.groupBy("word", "n", F.col("ew.p").alias("piece"))
        .agg(F.sum(F.col("ew.w")).alias("_ew"))
        .select(
            "piece",
            F.floor(
                F.col("n").cast("double") * F.col("_ew") * F.lit(float(MICRO))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("_c"),
        )
    )
    return contrib.groupBy("piece").agg(F.sum("_c").cast("long").alias("cnt"))


def unigram_train_soft(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 2000,
    max_piece_len: int = 6,
    em_iters: int = 1,
    materialize: str | MaterializeFn | bool | None = None,
) -> DataFrame:
    """Expected-count (soft) EM unigram-LM training — the
    SentencePiece-family statistic (Kudo 2018 §3.2: E-step =
    forward-backward posteriors over ALL segmentations, not just the
    Viterbi path). See the variant matrix at the top of this
    section for when to prefer this over :func:`unigram_train`.

    Returns (piece, cnt, score, piece_id, prob): ``cnt`` is the
    MICRO-rounded expected count (units of 1e-6 — divide by
    ``MICRO`` for the float statistic), ``prob`` the Laplace-smoothed
    piece probability, and ``score``/``piece_id`` the SAME shape the
    hard-EM table ships — ``score = floor(log2(prob)·2^FRAC_BITS)``
    — so the table drops into :func:`unigram_encode_docs` /
    :func:`unigram_encode_words` and the composed pipeline
    (``PipelineConfig.unigram_vocab``) unchanged. Seeding and the
    prune rule are the hard-EM ones (substring counts; rank by
    (cnt DESC, piece ASC) + single-char coverage), so the two
    variants differ ONLY in the E-step statistic."""
    words = _materialize(_words_with_counts(docs, text_col), materialize)
    pieces = _with_probs(
        _prune(_substring_candidates(words, max_piece_len), vocab_size),
        micro=False,
    )
    for _ in range(em_iters):
        pieces = _materialize(pieces, materialize)
        counts = _expected_counts(words, pieces, max_piece_len)
        chars = (
            pieces.filter(F.length("piece") == 1)
            .select("piece")
            .join(counts, "piece", "left_anti")
            .withColumn("cnt", F.lit(0).cast("long"))
        )
        pieces = _with_probs(
            _prune(counts.unionByName(chars), vocab_size), micro=True
        )
    ranked = pieces.withColumn(
        "piece_id",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
        ).cast("int"),
    ).withColumn(
        # fixed-point log2 score for the integer Viterbi encoder; the
        # ONLY float→int boundary in the output (JVM vs libm log2 can
        # differ in the last ulp, hence the fuzz's ±1 tolerance here
        # while counts compare EXACTLY)
        "score",
        F.floor(F.log2(F.col("th")) * F.lit(float(1 << FRAC_BITS))).cast(
            "long"
        ),
    )
    return ranked.select(
        "piece", "cnt", "score", "piece_id", F.col("th").alias("prob")
    )


def unigram_train_soft_py(
    texts: list[str],
    vocab_size: int = 2000,
    max_piece_len: int = 6,
    em_iters: int = 1,
) -> dict:
    """Pure-Python twin of :func:`unigram_train_soft` — identical
    fold order (edges sorted by (i, j, p)), identical micro-rounding
    point, identical prune. Returns
    {"pieces": {piece: (cnt_micro, score, piece_id, prob)}}."""
    import math

    wc: dict[str, int] = {}
    for t in texts:
        for w in re.split(WORD_PATTERN, (t or "").lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1

    def prune(c: dict[str, int]) -> dict[str, int]:
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        keep = {p for p, _ in ranked[:vocab_size]}
        keep |= {p for p in c if len(p) == 1}
        return {p: c[p] for p in keep}

    def probs_of(c: dict[str, int], micro: bool) -> dict[str, float]:
        scale = float(MICRO) if micro else 1.0
        t = 0
        for v in c.values():
            t += v
        td = t / scale
        v = float(len(c))
        return {p: (cv / scale + 1.0) / (td + v) for p, cv in c.items()}

    cands: dict[str, int] = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + l]
                cands[p] = cands.get(p, 0) + n
    counts = prune(cands)
    micro = False
    for _ in range(em_iters):
        th = probs_of(counts, micro)
        newc: dict[str, int] = {}
        for w, n in wc.items():
            L = len(w)
            edges = sorted(
                (i, j, w[i:j])
                for i in range(L)
                for j in range(i + 1, min(i + max_piece_len, L) + 1)
                if w[i:j] in th
            )
            fw = [1.0] + [0.0] * L
            for j in range(1, L + 1):
                s = 0.0
                for (ei, ej, ep) in edges:
                    if ej == j:
                        s = s + fw[ei] * th[ep]
                fw[j] = s
            bw = [0.0] * L + [1.0]
            for i in range(L - 1, -1, -1):
                s = 0.0
                for (ei, ej, ep) in edges:
                    if ei == i:
                        s = s + th[ep] * bw[ej]
                bw[i] = s
            z = bw[0]
            per_piece: dict[str, float] = {}
            for (ei, ej, ep) in edges:
                wgt = fw[ei] * th[ep] * bw[ej] / z
                per_piece[ep] = per_piece.get(ep, 0.0) + wgt
            for p, ew in per_piece.items():
                c = math.floor(float(n) * ew * float(MICRO) + 0.5)
                newc[p] = newc.get(p, 0) + c
        for p in counts:
            if len(p) == 1 and p not in newc:
                newc[p] = 0
        counts = prune(newc)
        micro = True
    th = probs_of(counts, micro)
    frac = float(1 << FRAC_BITS)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return {
        "pieces": {
            p: (c, math.floor(math.log2(th[p]) * frac), i + 1, th[p])
            for i, (p, c) in enumerate(ranked)
        }
    }


def unigram_sample_words(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 6,
    alpha: float = 0.2,
    salt: str = "sp",
) -> DataFrame:
    """Subword-REGULARIZATION segmentation (Kudo 2018 §4: sample a
    segmentation from P(seg|word) instead of taking the Viterbi
    argmax — the tokenizer-side data augmentation SentencePiece users
    train with): (word, n, pieces array<string>).

    Sampling is the standard lattice filtration: backward weights
    ``β[i] = Σ_{edges i→j} θ^α·β[j]`` (``alpha`` is the smoothing
    temperature — α→0 approaches uniform over segmentations, α=1
    samples the model distribution), then a forward walk choosing
    edge ``i→j`` with probability ``θ^α·β[j]/β[i]``.

    DETERMINISTIC sampling: the per-position uniform is
    ``md5(salt ␟ word ␟ pos)/2^60`` — a pure function of
    (salt, word, position), so the operator is reproducible,
    cluster-order-independent, and cheap at corpus scale (segment
    DISTINCT words once, join back). Vary ``salt`` per training
    epoch to RESAMPLE the whole corpus — the published
    regularization recipe. If per-OCCURRENCE diversity inside one
    epoch matters more than the distinct-word collapse, call this
    once per occurrence group with an occurrence-derived salt (e.g.
    shard id) — the cost model then scales with occurrences, which
    is inherent to per-occurrence sampling, not to this operator.

    ``vocab`` may be a soft table (has ``prob``) or the hard-EM
    table (``prob`` derived as ``2^(score/2^FRAC_BITS)``); OOV
    single chars get the UNK weight so every word stays segmentable.
    Gated by pytest against :func:`unigram_sample_words_py` (exact
    piece parity — same md5 uniforms, same float ops in the same
    order); no SQL oracle, same contract as the soft trainer."""
    from .text import md5_60bit

    has_prob = "prob" in vocab.columns
    prob = (
        F.col("prob")
        if has_prob
        else F.pow(
            F.lit(2.0),
            F.col("score").cast("double") / F.lit(float(1 << FRAC_BITS)),
        )
    )
    pieces = vocab.select(F.col("piece"), prob.alias("_pr"))
    unk_w = float(2.0 ** (UNK_SCORE / float(1 << FRAC_BITS))) ** alpha

    spans = _word_spans(words, max_piece_len)
    scored = spans.join(
        F.broadcast(pieces.select(F.col("piece").alias("p"), "_pr")),
        "p",
        "left",
    ).withColumn(
        "th_a",
        F.coalesce(
            F.pow(F.col("_pr"), F.lit(float(alpha))),
            F.when(F.col("j") - F.col("i") == 1, F.lit(unk_w)),
        ),
    ).filter(F.col("th_a").isNotNull())
    edges = scored.groupBy("word", "n").agg(
        F.array_sort(
            F.collect_list(F.struct("i", "j", "p", F.col("th_a").alias("th")))
        ).alias("_edges")
    )

    ec, ln = F.col("_edges"), F.length("word").cast("int")

    def bwd_step(acc: Column, t: Column) -> Column:
        s = F.aggregate(
            F.filter(ec, lambda e: e["i"] == ln - t),
            F.lit(0.0),
            lambda s2, e: s2 + e["th"] * F.element_at(acc, ln - e["j"] + 1),
        )
        return F.concat(acc, F.array(s))

    with_b = edges.withColumn(
        "_bwr",
        F.aggregate(F.sequence(F.lit(1), ln), F.array(F.lit(1.0)), bwd_step),
    )
    bwr = F.col("_bwr")

    def beta(pos: Column) -> Column:
        return F.element_at(bwr, ln - pos + 1)

    # forward sampling walk: at pos i draw u ~ md5(salt␟word␟i)/2^60,
    # take the FIRST edge (sorted order) whose cumulative θ^α·β[j]
    # exceeds u·β[i]; the last edge catches the float tail.
    def walk_step(acc: Column, _: Column) -> Column:
        pos = acc["pos"]
        cands = F.filter(ec, lambda e: e["i"] == pos)
        u = (
            md5_60bit(
                F.concat(
                    F.lit(salt), F.lit("\x1f"), F.col("word"),
                    F.lit("\x1f"), pos.cast("string"),
                )
            ).cast("double")
            / F.lit(float(1 << 60))
        )
        target = u * beta(pos)
        k = F.size(cands)
        cums = F.transform(
            F.sequence(F.lit(1), k),
            lambda m: F.aggregate(
                F.slice(cands, 1, m),
                F.lit(0.0),
                lambda s2, e: s2 + e["th"] * beta(e["j"]),
            ),
        )
        hit = F.filter(
            F.sequence(F.lit(1), k),
            lambda m: F.element_at(cums, m) > target,
        )
        chosen = F.element_at(
            cands,
            F.when(F.size(hit) > 0, F.element_at(hit, 1)).otherwise(k),
        )
        return F.when(
            pos < ln,
            F.struct(
                chosen["j"].alias("pos"),
                F.concat(acc["parts"], F.array(chosen["p"])).alias("parts"),
            ),
        ).otherwise(acc)

    walk = F.aggregate(
        F.sequence(F.lit(1), F.greatest(ln, F.lit(1))),
        F.struct(
            F.lit(0).cast("int").alias("pos"),
            F.array().cast("array<string>").alias("parts"),
        ),
        walk_step,
    )
    return with_b.select("word", "n", walk["parts"].alias("pieces"))


def unigram_sample_words_py(
    word: str,
    probs: dict[str, float],
    max_piece_len: int = 6,
    alpha: float = 0.2,
    salt: str = "sp",
) -> list[str]:
    """Pure-python twin of :func:`unigram_sample_words` for one word
    — identical edge order, float ops, md5 uniforms."""
    import hashlib

    unk_w = float(2.0 ** (UNK_SCORE / float(1 << FRAC_BITS))) ** alpha
    L = len(word)
    edges = []
    for i in range(L):
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            p = word[i:j]
            if p in probs:
                edges.append((i, j, p, probs[p] ** alpha))
            elif j - i == 1:
                edges.append((i, j, p, unk_w))
    edges.sort(key=lambda e: (e[0], e[1], e[2]))
    bw = [0.0] * L + [1.0]
    for i in range(L - 1, -1, -1):
        s = 0.0
        for (ei, ej, ep, th) in edges:
            if ei == i:
                s = s + th * bw[ej]
        bw[i] = s
    parts: list[str] = []
    pos = 0
    for _ in range(max(L, 1)):
        if pos >= L:
            break
        key = f"{salt}\x1f{word}\x1f{pos}".encode("utf-8")
        h = int(hashlib.md5(key).hexdigest()[:15], 16)
        u = float(h) / float(1 << 60)
        target = u * bw[pos]
        cands = [e for e in edges if e[0] == pos]
        cum = 0.0
        chosen = cands[-1]
        for e in cands:
            cum = cum + e[3] * bw[e[1]]
            if cum > target:
                chosen = e
                break
        parts.append(chosen[2])
        pos = chosen[1]
    return parts


def unigram_sample_docs(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 6,
    alpha: float = 0.2,
    salt: str = "sp",
) -> DataFrame:
    """Doc-level subword-regularization encode — the sampled twin of
    :func:`unigram_encode_docs`: (id, pieces, piece_ids, n_pieces,
    n_oov), each word replaced by its SAMPLED segmentation
    (:func:`unigram_sample_words`). Same distinct-word collapse and
    re-assembly as the Viterbi path; vary ``salt`` per epoch to
    resample the whole corpus."""
    tokens = _doc_tokens(docs, id_col, text_col)
    sseg = _attach_piece_ids(
        unigram_sample_words(
            tokens.groupBy("word").agg(
                F.count(F.lit(1)).cast("long").alias("n")
            ),
            vocab,
            max_piece_len,
            alpha=alpha,
            salt=salt,
        ),
        vocab,
    ).select("word", "pieces", "piece_ids")
    return _assemble_docs(
        docs, tokens, sseg, id_col, empty_arr=_token_array(text_col)
    )
