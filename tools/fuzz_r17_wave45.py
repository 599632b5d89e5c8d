"""Falsification session, round 17 waves 4-5 — adversarial fuzz over
the wave's new surfaces with INDEPENDENT brute-force twins (pure
python set/counter arithmetic written here, not the library twins,
wherever the library twin shares code with the engine path) plus
Spark-vs-DuckDB legs for the oracle-paired operators. Output is the
receipt (tools/receipts/fuzz_r17_wave45.txt)."""
import hashlib
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

t0 = time.time()
rng = np.random.default_rng(20260817)
checks = 0
fails = 0

WORDS = ["the", "cat", "dog", "sat", "ran", "on", "mat", "a", "nice",
         "day", "buy", "gold", "click", "prize", "zq1", "vx2", "qp3",
         "library", "quiet", "books"]


def md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# ---------- 1. DSIR fit/score vs an INDEPENDENT brute-force
# (hashing, Laplace counts and llog2 recomputed here from scratch —
# not via quality_model's helpers)
from gcp_dataengineering_spark.llm_ops import dsir as DS


def bf_llog2(x: int, fb: int = 16) -> int:
    s = 1 << fb
    e = x.bit_length() - 1
    m = (x >> (e - fb)) if e >= fb else (x << (fb - e))
    return e * s + m - s


def bf_feats(text: str, ngrams: int) -> list:
    toks = [t for t in re.split("[^a-z]+", (text or "").lower()) if t]
    out = list(toks)
    if ngrams == 2:
        out += [a + "\x1e" + b for a, b in zip(toks, toks[1:])]
    return out


def bf_buckets(text: str, B: int, salt: str, ngrams: int) -> list:
    return [md5_60(salt + "\x1f" + f) % B for f in bf_feats(text, ngrams)]


def bf_dsir_weights(target, raw, B, salt, ngrams):
    cT = [0] * B
    cR = [0] * B
    for t in target:
        for b in bf_buckets(t, B, salt, ngrams):
            cT[b] += 1
    for t in raw:
        for b in bf_buckets(t, B, salt, ngrams):
            cR[b] += 1
    TT, TR = sum(cT) + B, sum(cR) + B
    return [
        (bf_llog2(cT[b] + 1) - bf_llog2(TT))
        - (bf_llog2(cR[b] + 1) - bf_llog2(TR))
        for b in range(B)
    ], cT, cR


for trial in range(60):
    B = int(rng.choice([32, 64, 128]))
    ngrams = int(rng.choice([1, 2]))
    nt, nr = int(rng.integers(1, 8)), int(rng.integers(1, 15))
    mk = lambda: " ".join(rng.choice(WORDS, size=int(rng.integers(0, 14))))
    target = [mk() for _ in range(nt)]
    raw = [mk() for _ in range(nr)]
    if trial % 7 == 0:
        raw[0] = "123 !!! ..."  # feature-less
    w, cT, cR = bf_dsir_weights(target, raw, B, "dsir", ngrams)
    twin = DS.dsir_fit_py(target, raw, num_buckets=B, ngrams=ngrams)
    for b in range(B):
        checks += 3
        if (twin["weights"][b] != w[b] or twin["c_target"][b] != cT[b]
                or twin["c_raw"][b] != cR[b]):
            fails += 1
            print(f"FAIL dsir fit trial={trial} bucket={b}")
            break
    for d in raw:
        checks += 1
        bf = sum(w[b] for b in bf_buckets(d, B, "dsir", ngrams))
        if DS.dsir_score_py(d, twin["weights"], ngrams=ngrams) != bf:
            fails += 1
            print(f"FAIL dsir score trial={trial}")
print(f"[1] dsir fit/score vs independent brute force: "
      f"{checks} checks, {fails} fails ({time.time()-t0:.0f}s)")

# ---------- 2. hash-Gumbel: independent brute force + DuckDB, wide
# id range, plus the resample group rule vs a sort-based brute force
c2 = f2 = 0
con = duckdb.connect()
for trial in range(40):
    n = int(rng.integers(1, 60))
    ids = [int(x) for x in rng.integers(-(2**50), 2**50, size=n)]
    scores = {i: int(x) for i, x in zip(ids, rng.integers(-(1 << 28), 1 << 28, size=n))}
    if trial % 5 == 0 and n >= 3:  # planted quantized-key ties
        it = list(scores)
        scores[it[1]] = scores[it[0]]
        scores[it[2]] = scores[it[0]] + 1
    for i in ids:
        c2 += 2
        h = md5_60("dsir-g\x1f" + str(i)) + 1
        v = max(60 * 65536 - bf_llog2(h), 1)
        g = -(bf_llog2(v) - 16 * 65536)
        if DS.hash_gumbel_py(i) != g:
            f2 += 1
            print(f"FAIL gumbel py trial={trial} id={i}")
        sql = con.execute(
            f"SELECT {DS.hash_gumbel_sql('i')} FROM (SELECT ?::BIGINT AS i)",
            [i],
        ).fetchone()[0]
        if sql != g:
            f2 += 1
            print(f"FAIL gumbel sql trial={trial} id={i}")
    # resample rule vs brute force: sort keys desc, walk whole
    # quantized groups, select while the count above is under target
    num, den = int(rng.integers(1, 4)), int(rng.integers(2, 6))
    shift = int(rng.choice([8, 12]))
    gum = bool(rng.integers(0, 2))
    keys = {
        i: scores[i] + (DS.hash_gumbel_py(i) if gum else 0) for i in ids
    }
    want = {}
    groups = {}
    for k in keys.values():
        groups[k >> shift] = groups.get(k >> shift, 0) + 1
    before = 0
    for qk in sorted(groups, reverse=True):
        sel = before * den < len(ids) * num
        want[qk] = sel
        before += groups[qk]
    got = DS.dsir_resample_py(
        list(scores.items()), num, den, gumbel=gum, key_shift=shift
    )
    for i in ids:
        c2 += 1
        if got[i] != (keys[i], want[keys[i] >> shift]):
            f2 += 1
            print(f"FAIL resample trial={trial} id={i}")
checks += c2
fails += f2
print(f"[2] hash-Gumbel + resample rule vs brute force/DuckDB: "
      f"{c2} checks, {f2} fails ({time.time()-t0:.0f}s)")

# ---------- 3. contamination fraction rule vs brute-force n-gram sets
from gcp_dataengineering_spark.llm_ops import decontam as DC
from gcp_dataengineering_spark.session import get_spark

spark = get_spark("fuzz45", cpus=8, shuffle_partitions=8)
c3 = f3 = 0
for trial in range(15):
    n = int(rng.choice([2, 3, 5]))
    ntr, nev = int(rng.integers(1, 10)), int(rng.integers(1, 5))
    mk = lambda lo, hi: " ".join(rng.choice(WORDS, size=int(rng.integers(lo, hi))))
    train_rows = [(i, mk(0, 14)) for i in range(ntr)]
    eval_rows = [(100 + i, mk(2, 10)) for i in range(nev)]
    if trial % 3 == 0:  # plant a verbatim leak
        train_rows[0] = (0, eval_rows[0][1] + " tail pad")
    num, den = int(rng.integers(1, 3)), int(rng.integers(2, 5))
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_shared_grams, r.n_eval_docs, r.n_grams_total)
        for r in DC.contamination_hits(
            tr, ev, n=n, min_shared_frac=(num, den)
        ).collect()
    }

    def sh(t):
        w = [x for x in (t or "").lower().split() if x]
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    ev_sh = [(eid, sh(t)) for eid, t in eval_rows]
    for did, t in train_rows:
        s = sh(t)
        shared = s & set().union(*[e for _, e in ev_sh]) if ev_sh else set()
        nev_hit = sum(1 for _, e in ev_sh if s & e)
        c3 += 1
        expect = (
            (len(shared), nev_hit, len(s))
            if shared and len(shared) * den >= num * len(s)
            else None
        )
        if got.get(did) != expect:
            f3 += 1
            print(f"FAIL frac trial={trial} doc={did} got={got.get(did)} want={expect}")
checks += c3
fails += f3
print(f"[3] fraction decontam vs brute-force gram sets: "
      f"{c3} checks, {f3} fails ({time.time()-t0:.0f}s)")

# ---------- 4. contamination_minhash vs brute-force signatures/bands
c4 = f4 = 0
for trial in range(8):
    ntr, nev = int(rng.integers(2, 8)), int(rng.integers(1, 4))
    mk = lambda: " ".join(rng.choice(WORDS, size=int(rng.integers(4, 16))))
    train_rows = [(i, mk()) for i in range(ntr)]
    eval_rows = [(900 + i, mk()) for i in range(nev)]
    if trial % 2 == 0:  # plant a near-copy
        train_rows[0] = (0, eval_rows[0][1] + " extra tail")
    thr = float(rng.choice([0.25, 0.5, 0.75]))
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_eval_docs, r.max_est_jaccard)
        for r in DC.contamination_minhash(tr, ev, min_est_jaccard=thr).collect()
    }

    def sig(t):
        w = [x for x in (t or "").lower().split() if x]
        s = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        if not s:
            return None
        return [min(md5_60(f"{h}\x1f{x}") for x in s) for h in range(8)]

    esigs = [(eid, sig(t)) for eid, t in eval_rows]
    for did, t in train_rows:
        ts = sig(t)
        hits = []
        for eid, es in esigs:
            if ts is None or es is None:
                continue
            bands = any(
                ts[2 * b:2 * b + 2] == es[2 * b:2 * b + 2] for b in range(4)
            )
            if not bands:
                continue
            ej = sum(1 for i in range(8) if ts[i] == es[i]) / 8
            if ej >= thr:
                hits.append(ej)
        c4 += 1
        expect = (len(hits), max(hits)) if hits else None
        if got.get(did) != expect:
            f4 += 1
            print(f"FAIL minhash trial={trial} doc={did} got={got.get(did)} want={expect}")
checks += c4
fails += f4
print(f"[4] fuzzy decontam vs brute-force minhash/bands: "
      f"{c4} checks, {f4} fails ({time.time()-t0:.0f}s)")

# ---------- 5. gopher_repetition: Spark vs the generated DuckDB SQL
# vs an independent brute-force python computation of every fraction
from gcp_dataengineering_spark.llm_ops.text import (
    GOPHER_REPETITION_LIMITS,
    gopher_repetition_features,
)
from gcp_dataengineering_spark.suite.llm import gopher_repetition_sql


def r4(v):
    # the repo's pinned twin-rounding rule (ngram_lm r16 finding):
    # HALF-UP on the double's shortest representation — python's
    # builtin round() is banker's and diverges at exact .xxxx5 ties
    # (this session's fuzz hit 137/160 = 0.85625)
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(v)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def bf_gopher(text):
    import collections
    out = {k: 0.0 for k in GOPHER_REPETITION_LIMITS}
    t = text or ""
    w = [x for x in t.lower().split() if x]
    wchars = sum(len(x) for x in w)
    for kind, pat in (("line", "\n"), ("para", None)):
        units = [
            u.strip()
            for u in (t.split("\n") if pat else re.split(r"\n{2,}", t))
        ]
        units = [u for u in units if u]
        cnt = collections.Counter(units)
        n_u = len(units)
        chars = sum(len(u) for u in units)
        dups = sum(1 for u in units if cnt[u] >= 2)
        dchars = sum(len(u) for u in units if cnt[u] >= 2)
        out[f"dup_{kind}_frac"] = r4(dups / max(n_u, 1))
        out[f"dup_{kind}_char_frac"] = r4(dchars / max(chars, 1))
    content = wchars + max(len(w) - 1, 0)
    for n in (2, 3, 4):
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        if not grams:
            continue
        cnt = collections.Counter(grams)
        best = max(cnt.items(), key=lambda kv: (kv[1], len(kv[0]),
                                                [-ord(c) for c in kv[0]]))
        out[f"top_{n}gram_char_frac"] = r4(
            best[1] * len(best[0]) / max(content, 1)
        )
    for n in range(5, 11):
        grams = [(i, " ".join(w[i:i + n])) for i in range(len(w) - n + 1)]
        cnt = collections.Counter(g for _, g in grams)
        cover = set()
        for i, g in grams:
            if cnt[g] >= 2:
                cover.update(range(i, i + n))
        out[f"dup_{n}gram_char_frac"] = r4(
            sum(len(w[i]) for i in cover) / max(wchars, 1)
        )
    out["rep_pass"] = all(
        out[k] <= lim for k, lim in GOPHER_REPETITION_LIMITS.items()
    )
    return out


c5 = f5 = 0
for trial in range(10):
    nd = int(rng.integers(2, 8))
    rows = []
    for d in range(nd):
        segs = []
        for _ in range(int(rng.integers(1, 5))):
            seg = " ".join(rng.choice(WORDS[:6], size=int(rng.integers(0, 18))))
            segs.append(seg)
            if rng.integers(0, 3) == 0:
                segs.append(seg)  # planted dup line
        sep = "\n\n" if rng.integers(0, 2) else "\n"
        rows.append((d, sep.join(segs)))
    if trial % 4 == 0:
        rows[0] = (0, "")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in gopher_repetition_features(df).collect()}
    con2 = duckdb.connect()
    con2.register("fx", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = {}
    cur = con2.execute(gopher_repetition_sql("SELECT doc_id, text FROM fx"))
    cols = [d[0] for d in cur.description]
    for rec in cur.fetchall():
        duck[dict(zip(cols, rec))["doc_id"]] = dict(zip(cols, rec))
    for did, text in rows:
        bf = bf_gopher(text)
        for k in list(GOPHER_REPETITION_LIMITS) + ["rep_pass"]:
            c5 += 2
            if got[did][k] != bf[k]:
                f5 += 1
                print(f"FAIL gopher bf trial={trial} doc={did} col={k} "
                      f"got={got[did][k]} want={bf[k]}")
            if duck[did][k] != got[did][k]:
                f5 += 1
                print(f"FAIL gopher duck trial={trial} doc={did} col={k}")
checks += c5
fails += f5
print(f"[5] gopher repetition: Spark vs DuckDB vs independent brute "
      f"force: {c5} checks, {f5} fails ({time.time()-t0:.0f}s)")

print(f"\nTOTAL: {checks} checks, {fails} fails in {time.time()-t0:.0f}s")
sys.exit(1 if fails else 0)
