"""r18 falsification session — adversarial checks for the round's
new surfaces, with independent brute-force twins where one exists
and crash/contract properties where none can (the r16/r17 session
pattern; receipt: tools/receipts/fuzz_r18.txt).

Legs:
1. PDF corruption fuzz: every fixture variant × byte truncations ×
   seeded byte flips × random garbage — parse_pdf must ALWAYS
   return the 6-tuple with ok=False+stable-reason or a well-formed
   success, never raise, never hang (the quarantine contract).
2. PDF roundtrip battery: the writer's closed-form text must come
   back exactly for every variant over a wide id range (the oracle
   identity, re-proven outside Spark).
3. Unigram byte-fallback brute twin: random words (ASCII, accents,
   CJK, emoji, mixed) segmented by viterbi_py + a hand-rolled
   Python byte expansion must equal the Spark path's piece/byte
   sequences; decode must round-trip losslessly.
4. Router contract: random payload heads (pdf magic, html-ish,
   utf-8 text, binary junk, empty) → exactly one output row per
   input with a sane (format, ok) combination.
5. lang_id wave-2 stability: the 61-language fixture prediction is
   a pure function — shuffled row order and duplicated rows change
   nothing.

Run: python tools/fuzz_r18.py  (prints one PASS/FAIL line per leg +
a final count; exit 1 on any failure).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcp_dataengineering_spark.llm_ops.pdf import (  # noqa: E402
    _pdf_line,
    parse_pdf,
    synth_pdf_payload,
)

CHECKS = 0
FAILS = []


def check(cond, label):
    global CHECKS
    CHECKS += 1
    if not cond:
        FAILS.append(label)


# ------------------------------------------------------------ leg 1
def leg_pdf_corruption():
    rng = random.Random(1818)
    n = 0
    for did in range(40):
        base = synth_pdf_payload(did)
        # every-prefix-ish truncations (stride keeps it bounded)
        for cut in range(0, len(base), max(1, len(base) // 40)):
            out = parse_pdf(base[:cut])
            check(isinstance(out, tuple) and len(out) == 6, "pdf-shape")
            check(out[0] in (True, False), "pdf-ok-bool")
            if not out[0]:
                check(isinstance(out[1], str) and out[1], "pdf-reason")
            n += 1
        # seeded byte flips
        for _ in range(60):
            b = bytearray(base)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            out = parse_pdf(bytes(b))
            check(isinstance(out, tuple) and len(out) == 6, "pdf-flip-shape")
            if not out[0]:
                check(isinstance(out[1], str) and out[1], "pdf-flip-reason")
            n += 1
    # pure garbage
    for _ in range(300):
        g = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
        out = parse_pdf(g)
        check(isinstance(out, tuple) and len(out) == 6, "pdf-garbage-shape")
        check(out[0] is False, "pdf-garbage-quarantined")
        n += 1
    # garbage behind a real header
    for _ in range(200):
        g = b"%PDF-1.4\n" + bytes(
            rng.randrange(256) for _ in range(rng.randrange(0, 300))
        )
        out = parse_pdf(g)
        check(isinstance(out, tuple) and len(out) == 6, "pdf-hdr-garbage")
        n += 1
    return n


# ------------------------------------------------------------ leg 2
def leg_pdf_roundtrip():
    n = 0
    for did in range(200):
        var = did % 10
        ok, err, ver, n_pages, title, text = parse_pdf(
            synth_pdf_payload(did)
        )
        if var in (6, 7):
            check(not ok and err in ("no-startxref", "encrypted"),
                  f"rt-quarantine-{did}")
            n += 1
            continue
        want_pages = 2 if var == 1 else 1
        sep = "" if var == 3 else "\n"
        pages = [
            sep.join(_pdf_line(did, p, k) for k in range(3))
            for p in range(want_pages)
        ]
        want = "\n\n".join(pages)
        if var == 5:
            want = want.replace("w", "→")
        check(ok and text == want and title == f"Fixture {did}"
              and n_pages == want_pages
              and ver == ("1.5" if var in (8, 9) else "1.4"),
              f"rt-{did}")
        n += 1
    return n


# ------------------------------------------------------------ leg 3
def leg3_byte_fallback_twin(spark):
    from gcp_dataengineering_spark.llm_ops import unigram as U
    from pyspark.sql import functions as F  # noqa: F401

    texts = [
        "the cat sat on the mat", "the matter of the cats",
        "scattered cattle that sat on mats", "a mat a cat a rat",
    ] * 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = U.unigram_train(docs, vocab_size=30, max_piece_len=4)
    scores = {r.piece: r.score for r in vocab.collect()}
    ids = {r.piece: r.piece_id for r in vocab.collect()}

    def twin(word):
        pieces = U.viterbi_py(word, scores, 4)
        out_p, out_i = [], []
        for p in pieces:
            pid = ids.get(p)
            if pid is not None:
                out_p.append(p)
                out_i.append(pid)
            else:
                for bt in p.encode("utf-8"):
                    out_p.append(f"<0x{bt:02X}>")
                    out_i.append(-(bt + 1))
        return out_p, out_i

    rng = random.Random(42)
    pools = [
        "abcdefghijklmnopqrstuvwxyz",
        "àâçéèêëîïôùûüÿæœ",
        "日本語中文漢字測試文字",
        "😀🎉🚀🔥💡",
        "абвгдежзиклмн",
    ]
    words = set()
    while len(words) < 400:
        pool = rng.choice(pools) + (
            "catsmater" if rng.random() < 0.5 else ""
        )
        w = "".join(rng.choice(pool) for _ in range(rng.randrange(1, 9)))
        words.add(w)
    wdf = spark.createDataFrame(
        [(w, 1) for w in sorted(words)], "word string, n long"
    )
    got = {
        r.word: (list(r.pieces), list(r.piece_ids))
        for r in U.unigram_encode_words(
            wdf, vocab, 4, byte_fallback=True
        ).collect()
    }
    n = 0
    for w in sorted(words):
        want = twin(w)
        check(got[w] == want, f"bf-twin-{w!r}")
        check(
            U.unigram_decode_pieces(got[w][0], got[w][1]) == w,
            f"bf-roundtrip-{w!r}",
        )
        n += 2
    return n


# ------------------------------------------------------------ leg 4
def leg4_router_contract(spark):
    from gcp_dataengineering_spark.llm_ops.docformats import (
        extract_documents,
    )

    rng = random.Random(7)
    rows = []
    for i in range(300):
        kind = i % 5
        if kind == 0:
            p = synth_pdf_payload(i)
        elif kind == 1:
            p = (b"<html><body><p>x" + str(i).encode() + b"</p></body>")
        elif kind == 2:
            p = f"text {i} ok".encode()
        elif kind == 3:
            p = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        else:
            p = None
        rows.append((i, p))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = extract_documents(df).collect()
    check(len(out) == 300, "router-row-count")
    byid = {r.doc_id: r for r in out}
    n = 1
    for i, p in rows:
        r = byid[i]
        check(r.format in ("pdf", "html", "text", "binary"),
              f"router-format-{i}")
        if r.ok:
            check(r.err is None and r.text is not None, f"router-ok-{i}")
        else:
            check(r.err is not None and r.text is None, f"router-bad-{i}")
        n += 2
    return n


# ------------------------------------------------------------ leg 5
def leg5_langid_stability(spark):
    from pyspark.sql import functions as F

    from gcp_dataengineering_spark.llm_ops.text import lang_id

    sents = [
        ("cy", "mae hyn wedi bod yn dda iawn ond roedd y plant hefyd"),
        ("ga", "bhí sé ag obair agus níl a fhios agam cad atá ann"),
        ("mk", "не знам што се случи но тоа не е како што мислиш ќе видиме"),
        ("mn", "энэ бол их сайхан юм гэж би боддог тэр ч үнэн байсан юм"),
        ("fo", "hetta er ikki so gott men tey hava verið har og tað er eisini"),
        ("tg", "ман намедонам ки чӣ шуд аммо ин барои мо осон нест ва ҳар кас"),
    ]
    base = spark.createDataFrame(
        [(i, lang, s) for i, (lang, s) in enumerate(sents)],
        "i long, want string, text string",
    )
    a = {r.i: r.p for r in base.select(
        "i", lang_id("text").alias("p")).collect()}
    dup = base.unionByName(base).orderBy(F.rand(3))
    b = {r.i: r.p for r in dup.select(
        "i", lang_id("text").alias("p")).collect()}
    n = 0
    for i, (lang, _) in enumerate(sents):
        check(a[i] == lang, f"lid-{lang}")
        check(b[i] == lang, f"lid-shuffled-{lang}")
        n += 2
    return n


def main():
    total = 0
    total += leg_pdf_corruption()
    print(f"leg1 pdf corruption: {total} checks", flush=True)
    total += leg_pdf_roundtrip()
    print(f"leg2 pdf roundtrip: cumulative {total}", flush=True)

    from gcp_dataengineering_spark.session import get_spark

    spark = get_spark("fuzz-r18", cpus=8)
    total += leg3_byte_fallback_twin(spark)
    print(f"leg3 byte-fallback twin: cumulative {total}", flush=True)
    total += leg4_router_contract(spark)
    print(f"leg4 router contract: cumulative {total}", flush=True)
    total += leg5_langid_stability(spark)
    print(f"leg5 lang_id stability: cumulative {total}", flush=True)
    spark.stop()

    print(f"CHECKS={CHECKS} FAILS={len(FAILS)}")
    for f in FAILS[:20]:
        print("FAIL", f)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
