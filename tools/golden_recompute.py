#!/usr/bin/env python3
"""First-principles recompute of the two arithmetic golden queries,
independent of the engine (VERDICT r4 #7).

The golden VALUES pins in GoldenValues.scala are generated from the
engine's own output (tools/gen_goldens.py), which makes them regression
gates, not oracles. For the two kernels that are pure integer/hash
arithmetic — q_sentiment_buckets and q_text_fingerprint — this module
recomputes the expected rows directly from the parquet inputs with a
separate implementation (pure-Python xxHash64 per the public spec at
https://xxhash.com, plus the documented scoring rules), so
tools/check_oracle.py can verify the pins from first principles.

Semantics mirrored (and the files that define them):
 - tokenization: Java `\\s+` = ASCII whitespace only
   (graft/core/TextAnalysis.scala `tokens`)
 - sentiment: Laplace-smoothed positive fraction over the marker lexicon;
   hash-jittered neutral band otherwise (TextAnalysis.scala `sentiment`)
 - buckets: >0.7 positive, <0.3 negative, else neutral; per-bucket count
   + sum(floor(score*1000)) (analytics/TiebaAnalytics.scala
   `sentimentStats`)
 - fingerprint: 31-polynomial over SIGNED utf-8 bytes (Java byte), 64-bit
   wrap, then one xxh64 long-avalanche (ops/TextOps.scala
   `rollingFingerprint`; doc_id < 40 slice per Queries.scala)
"""
import math
import re

MASK = (1 << 64) - 1

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(v, r):
    v &= MASK
    return ((v << r) | (v >> (64 - r))) & MASK


def _round(acc, v):
    return (_rotl((acc + v * P2) & MASK, 31) * P1) & MASK


def _merge_round(h, v):
    return ((h ^ _round(0, v)) * P1 + P4) & MASK


def _avalanche(h):
    h &= MASK
    h = ((h ^ (h >> 33)) * P2) & MASK
    h = ((h ^ (h >> 29)) * P3) & MASK
    return h ^ (h >> 32)


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 of a byte string (public spec). Returns unsigned."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _avalanche(h)


def xxh64_long(v: int, seed: int = 0) -> int:
    """xxh64 of one 64-bit little-endian long (v taken mod 2^64)."""
    return xxh64((v & MASK).to_bytes(8, "little"), seed)


def to_signed(u: int) -> int:
    u &= MASK
    return u - (1 << 64) if u >= (1 << 63) else u


# Java's \s is ASCII-only by default (no UNICODE_CHARACTER_CLASS);
# Python's \s is unicode-aware, so spell the class out.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")

POSITIVE = {"好棒", "优秀", "喜欢", "精彩", "满意", "great", "happy"}
NEGATIVE = {"糟糕", "失望", "讨厌", "无聊", "难受", "awful", "sad"}


def tokens(text: str):
    return [t for t in _JAVA_WS.split(text) if t]


def sentiment(text: str) -> float:
    toks = tokens(text)
    pos = sum(1 for t in toks if t in POSITIVE)
    neg = sum(1 for t in toks if t in NEGATIVE)
    if pos + neg > 0:
        return (pos + 1) / (pos + neg + 2)
    jitter = (xxh64(text.encode("utf-8")) >> 11) % 1000
    return 0.3 + 0.4 * (jitter / 1000.0)


def sentiment_buckets(texts):
    """(label, cnt, score_milli_sum) rows over non-null texts — the
    recompute of q_sentiment_buckets (all three labels always present)."""
    acc = {"positive": [0, 0], "negative": [0, 0], "neutral": [0, 0]}
    for t in texts:
        if t is None:
            continue
        s = sentiment(t)
        label = "positive" if s > 0.7 else "negative" if s < 0.3 else "neutral"
        acc[label][0] += 1
        acc[label][1] += math.floor(s * 1000)
    return [(k, v[0], v[1]) for k, v in acc.items()]


def rolling_fingerprint(text: str) -> int:
    """31-polynomial over SIGNED utf-8 bytes, then xxh64 avalanche —
    returns the signed 64-bit value TextOps.rollingFingerprint produces."""
    h = 1125899906842597
    for b in text.encode("utf-8"):
        sb = b - 256 if b >= 128 else b  # Java byte is signed
        h = (31 * h + sb) & MASK
    return to_signed(xxh64_long(h))


def fingerprints(docs):
    """(doc_id, fp) rows for doc_id < 40 — the recompute of
    q_text_fingerprint. `docs` is an iterable of (doc_id, text)."""
    return [(int(d), rolling_fingerprint(t)) for d, t in docs if int(d) < 40]


def multimodal_resize(n=300, max_dim=8):
    """(kind, cnt, sum_w, sum_h, max_dim) rows — the recompute of
    q_multimodal_resize. The synthetic media dims are pure xxh64
    arithmetic (ops/Multimodal.scala `syntheticMedia`) and the resize
    target is floor(x+0.5) rounding of the aspect-preserving scale
    (`resizeImages`), so the whole pin rederives without a JVM."""
    agg = {}
    for i in range(n):
        k = i % 3
        if k == 0:
            kind = "image"
            w = 4 + ((xxh64_long(i, 2) >> 4) % 13)
            h = 4 + ((xxh64_long(i, 3) >> 4) % 13)
            if max(w, h) > max_dim:
                s = float(max_dim) / max(w, h)
                w2 = max(1, math.floor(w * s + 0.5))  # Scala math.round
                h2 = max(1, math.floor(h * s + 0.5))
                w, h = w2, h2
        elif k == 1:
            kind, w, h = "audio", 8000, 1  # WavCodec.SampleRate passthrough
        else:
            kind = "video"
            w = 4 + ((xxh64_long(i, 2) >> 4) % 5)
            h = 4 + ((xxh64_long(i, 3) >> 4) % 5)
        a = agg.setdefault(kind, [0, 0, 0, 0])
        a[0] += 1
        a[1] += w
        a[2] += h
        a[3] = max(a[3], max(w, h))
    return [(k, v[0], v[1], v[2], v[3]) for k, v in agg.items()]


def simhash64(text: str) -> int:
    """64-bit frequency-weighted SimHash over ASCII-whitespace tokens,
    bit b set iff the weighted majority of token xxh64 hashes carries
    bit b (ties -> 0) — mirrors ops/Dedup.scala `simHash`."""
    counts = {}
    for t in tokens(text):
        counts[t] = counts.get(t, 0) + 1
    acc = [0] * 64
    for tok, w in counts.items():
        h = xxh64(tok.encode("utf-8"))
        for b in range(64):
            if (h >> b) & 1:
                acc[b] += w
            else:
                acc[b] -= w
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


def simhash_pairs(docs, max_hamming=3):
    """(id_a, id_b, hamming) rows — the recompute of q_dedup_simhash.

    Rebuilds the query's input corpus (documents plus a perturbed copy
    doc_id+100000 with the first space-delimited word dropped, for
    doc_id < 10 — Queries.scala `docsWithNearDups`), then filters ALL
    pairs by Hamming distance. The engine blocks candidates on 4 16-bit
    SimHash blocks first, but by pigeonhole every pair at distance <= 3
    shares a block, so the blocked output equals this all-pairs filter.
    `docs` is an iterable of (doc_id, text)."""
    rows = [(int(d), t) for d, t in docs]
    aug = rows + [
        (d + 100000, t.split(" ", 1)[1] if " " in t else t)
        for d, t in rows if d < 10]
    sims = [(d, simhash64(t)) for d, t in aug]
    out = []
    for i in range(len(sims)):
        da, sa = sims[i]
        for j in range(i + 1, len(sims)):
            db, sb = sims[j]
            h = bin(sa ^ sb).count("1")
            if h <= max_hamming:
                out.append((min(da, db), max(da, db), h))
    return out
