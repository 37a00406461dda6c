"""Content-defined chunking (CDC) + rolling-hash substring fingerprints —
the machinery behind the long-exact-substring tier.

The reference dedups on *positionally* fixed blocks
(/root/reference/src/compressor.c:105-107), which cannot catch a shared
span at a shifted offset. CDC replaces positional cuts with
content-defined anchor points (a Gear/Rabin-style windowed hash hitting a
modulus), so two documents sharing a long verbatim span produce
identical interior chunks regardless of offset — the standard
dedup-storage trick (LBFS/Venti lineage) applied at document level.

Everything is numpy-vectorized over the Arrow batch: the windowed anchor
hash is a sliding-window matmul, the chunk fingerprints and the
Rabin-Karp L-gram hashes are prefix-polynomial algebra in the uint64
ring (mod 2^64 is free; the base is odd so it is invertible mod 2^64,
letting the prefix be computed with one cumsum + one cumprod instead of
a sequential loop).
"""

from __future__ import annotations

import numpy as np

_WINDOW = 16          # anchor-hash window (bytes)
_BASE = np.uint64(0x9E3779B97F4A7C15 | 1)   # odd -> invertible mod 2^64
_BASE_INV = np.uint64(pow(int(_BASE), -1, 1 << 64))

_gear_rng = np.random.default_rng(0xC0FFEE)
_GEAR = _gear_rng.integers(0, 1 << 63, size=256, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
_WEIGHTS = np.array(
    [int(_BASE) ** i % (1 << 64) for i in range(_WINDOW)], dtype=np.uint64
)


def _prefix_poly(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """P[i] = sum_{j<i} b[j]*B^(i-1-j) (mod 2^64), and pows[i] = B^i.

    Computed without a sequential loop: P[i] = B^i * cumsum(b[j]*B^-(j+1)).
    """
    n = len(b)
    inv_pows = np.empty(n, dtype=np.uint64)
    inv_pows[0] = _BASE_INV
    if n > 1:
        np.cumprod(np.full(n, _BASE_INV, dtype=np.uint64), out=inv_pows)
    c = np.cumsum(b * inv_pows, dtype=np.uint64)
    pows = np.empty(n + 1, dtype=np.uint64)
    pows[0] = 1
    if n:
        np.cumprod(np.full(n, _BASE, dtype=np.uint64), out=pows[1:])
    P = np.empty(n + 1, dtype=np.uint64)
    P[0] = 0
    P[1:] = c * pows[1:]
    return P, pows


def gram_hashes(data: bytes, L: int) -> np.ndarray:
    """All L-gram Rabin-Karp hashes of `data` (len n -> n-L+1 hashes)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    P, pows = _prefix_poly(b)
    return P[L:] - P[: n - L + 1] * pows[L]


def has_common_gram(a: bytes, b: bytes, L: int) -> bool:
    """True iff a and b share some length-L substring (64-bit fingerprint
    intersection; collision probability ~ (n*m)/2^64)."""
    ga = gram_hashes(a, L)
    if ga.size == 0:
        return False
    gb = gram_hashes(b, L)
    if gb.size == 0:
        return False
    return bool(np.intersect1d(ga, gb).size)


def _anchor_positions(b: np.ndarray, avg_len: int) -> np.ndarray:
    """Content-defined anchor candidates: positions i (cut AFTER byte i)
    where the gear hash of window b[i-15..i] is 0 mod avg_len."""
    n = len(b)
    if n < _WINDOW:
        return np.empty(0, dtype=np.int64)
    g = _GEAR[b]
    win = np.lib.stride_tricks.sliding_window_view(g, _WINDOW)
    h = win @ _WEIGHTS  # uint64 wraparound matmul
    mask = np.uint64(avg_len - 1)
    hits = np.nonzero((h & mask) == 0)[0] + (_WINDOW - 1)
    return hits + 1  # cut points (exclusive end)


def cdc_chunks(
    data: bytes, min_len: int, avg_len: int, max_len: int
) -> list[tuple[int, int, int]]:
    """Chunk `data` -> [(start, length, fingerprint64)].

    Anchors come from the windowed gear hash; min/max spacing is enforced
    in a short loop over ANCHORS (≈ n/avg_len iterations), never bytes.
    Identical content between synchronized anchors yields identical
    (length, fingerprint) pairs independently of its offset.
    """
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n == 0:
        return []
    anchors = _anchor_positions(b, avg_len)
    P, pows = _prefix_poly(b)

    cuts = [0]
    prev = 0
    for a in anchors:
        a = int(a)
        while a - prev > max_len:  # forced cut (no anchor in range)
            prev += max_len
            cuts.append(prev)
        if a - prev >= min_len:
            cuts.append(a)
            prev = a
    while n - prev > max_len:
        prev += max_len
        cuts.append(prev)
    if cuts[-1] != n:
        cuts.append(n)

    out = []
    # uint64 wraparound is the point; numpy warns on SCALAR overflow
    # (array ops wrap silently), so scope the suppression to this loop
    with np.errstate(over="ignore"):
        for s, e in zip(cuts, cuts[1:]):
            fp = int(P[e] - P[s] * pows[e - s])  # poly hash of b[s:e]
            out.append((s, e - s, fp - (1 << 64) if fp >= (1 << 63) else fp))
    return out
