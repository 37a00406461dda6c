"""Pure-python tests for CDC chunking + Rabin-Karp grams (no Spark)."""

import numpy as np
import pytest

from deduplication_spark.functions.chunking import (
    cdc_chunks,
    gram_hashes,
    has_common_gram,
)

MIN, AVG, MAX = 32, 128, 512


def _text(seed: int, n: int) -> bytes:
    rng = np.random.default_rng(seed)
    return bytes(rng.integers(97, 123, size=n, dtype=np.uint8))


def test_chunks_cover_input_and_respect_bounds():
    data = _text(1, 10_000)
    chunks = cdc_chunks(data, MIN, AVG, MAX)
    assert chunks[0][0] == 0
    assert sum(c[1] for c in chunks) == len(data)
    pos = 0
    for start, length, _fp in chunks:
        assert start == pos
        pos += length
        assert length <= MAX
    # MIN bound: anchors are only accepted >= MIN from the previous cut
    # and forced cuts are exactly MAX, so every chunk except the FINAL
    # one (the doc tail, the one documented forced boundary that may
    # fall short) must be >= MIN
    assert all(length >= MIN for _s, length, _f in chunks[:-1])


def test_chunks_deterministic():
    data = _text(2, 5_000)
    assert cdc_chunks(data, MIN, AVG, MAX) == cdc_chunks(data, MIN, AVG, MAX)


@pytest.mark.parametrize("offset_a,offset_b", [(0, 997), (512, 64), (33, 2048)])
def test_shared_span_shares_chunk_fingerprints(offset_a, offset_b):
    """A >=1024-byte verbatim span embedded at different offsets must
    yield at least one identical (fingerprint, length) chunk — the
    offset-independence property positional blocking lacks
    (/root/reference/src/compressor.c:105-107)."""
    span = _text(3, 1500)
    a = _text(4, offset_a) + span + _text(5, 3000)
    b = _text(6, offset_b) + span + _text(7, 2500)
    fps_a = {(fp, ln) for _s, ln, fp in cdc_chunks(a, MIN, AVG, MAX)}
    fps_b = {(fp, ln) for _s, ln, fp in cdc_chunks(b, MIN, AVG, MAX)}
    assert fps_a & fps_b


def test_gram_hashes_shift_invariant():
    data = _text(8, 400)
    g1 = gram_hashes(b"xx" + data, 64)
    g2 = gram_hashes(data, 64)
    assert set(g2) <= set(g1)


def test_has_common_gram():
    span = _text(9, 600)
    a = _text(10, 300) + span
    b = span + _text(11, 200)
    assert has_common_gram(a, b, 512)
    assert not has_common_gram(_text(12, 2000), _text(13, 2000), 512)
    assert not has_common_gram(b"short", b"also short", 512)


def test_substring_tier_miss_rate_bounded():
    """The ~2% probabilistic-miss claim (config.py substring_min_len) is
    EMPIRICAL, not just analytical: tools/substring_missrate.py measured
    0.8% over 2000 planted 512-byte-span pairs (BENCH/
    substring_missrate.json). This bounds a smaller resample at <= 5%
    so a chunker regression (anchor density, min/max spacing) that
    degrades the guarantee fails loudly."""
    import os
    import random
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.substring_missrate import candidate_caught, planted_pair

    from deduplication_spark.config import DedupConfig

    cfg = DedupConfig()
    misses = total = 0
    for seed in range(3):
        rng = random.Random(0xC0FFEE + seed)
        for _ in range(150):
            a, b = planted_pair(rng, cfg.substring_min_len)
            total += 1
            if not candidate_caught(a, b, cfg):
                misses += 1
    assert misses / total <= 0.05, f"miss rate {misses}/{total}"
