"""Multimodal binary-column plumbing (decode stubbed by design)."""

import pandas as pd
import pytest

from deduplication_spark.operators.multimodal import (
    byte_stride_resize,
    byte_window_frames,
    extract_features,
    fake_decoder,
    resize_media,
    sample_frames,
    sniff_modality,
    strict_decoder,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        {"id": 1, "payload": b"\xff\xd8\xff\xe0" + b"jpegdata" * 50},
        {"id": 2, "payload": b"\x89PNG\r\n" + b"pngdata" * 40},
        {"id": 3, "payload": b"RIFF" + b"wavdata" * 30},
        {"id": 4, "payload": b"plain text payload " * 20},
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_schema_and_metadata(spark, payloads):
    out = {r["id"]: r for r in extract_features(payloads).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["modality"] == "image/jpeg"
    assert out[2]["modality"] == "image/png"
    assert out[3]["modality"] == "audio/wav"
    assert out[4]["modality"] == "application/octet-stream"
    assert out[1]["magic_hex"] == "FFD8"
    assert out[1]["n_bytes"] == 4 + 8 * 50
    assert len(out[1]["feature"]) == 8


def test_features_deterministic(spark, payloads):
    a = sorted(map(tuple, extract_features(payloads).collect()))
    b = sorted(map(tuple, extract_features(payloads).collect()))
    assert a == b


def test_fake_decoder_unit():
    f1 = fake_decoder(b"hello world")
    f2 = fake_decoder(b"hello world")
    f3 = fake_decoder(b"other bytes!")
    assert f1 == f2 and f1 != f3 and len(f1) == 8


def test_strict_decoder_is_explicit_stub():
    from deduplication_spark.operators.multimodal import _PIL_Image

    if _PIL_Image is None:
        # no PIL in this container: strict decode is an explicit stub
        with pytest.raises(NotImplementedError):
            strict_decoder(b"anything")
    else:  # pragma: no cover — exercised only where PIL is installed
        # with PIL, strict means raise on UNDECODABLE, decode otherwise
        with pytest.raises(Exception):
            strict_decoder(b"anything")


def test_default_decoder_resolves_by_environment():
    """The import guard (round-3 verdict item 5): without PIL the
    default decoder IS the deterministic stand-in and pil_decoder
    raises LOUDLY (a silent per-process fallback on a mixed cluster
    would decode the same payload differently per executor); with PIL,
    real features come out of the same call with no code change, and
    only UNDECODABLE payloads degrade (deterministically, everywhere)."""
    from deduplication_spark.operators.multimodal import (
        _PIL_Image,
        default_decoder,
        pil_decoder,
    )

    if _PIL_Image is None:
        assert default_decoder is fake_decoder
        with pytest.raises(RuntimeError, match="PIL"):
            pil_decoder(b"not an image")
    else:  # pragma: no cover
        assert default_decoder is pil_decoder
        # undecodable payloads still degrade deterministically
        assert pil_decoder(b"not an image") == fake_decoder(b"not an image")


def test_sniff_modality():
    assert sniff_modality(b"\x1aE\xdf\xa3xxx") == "video/webm"
    assert sniff_modality(b"ID3\x04") == "audio/mp3"


def test_byte_window_frames_cover_payload():
    for payload in (b"0123456789", b"x" * 7, b"ab"):
        frames = byte_window_frames(payload, 4)
        assert len(frames) == 4
        assert b"".join(frames) == payload


def test_sample_frames_fanout_and_coverage(spark, payloads):
    src = {r["id"]: r["payload"] for r in payloads.collect()}
    rows = sample_frames(payloads, n_frames=4).collect()
    assert len(rows) == 4 * len(src)
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], {})[r["frame_idx"]] = bytes(r["frame"])
    for i, frames in by_id.items():
        assert sorted(frames) == [0, 1, 2, 3]
        assert b"".join(frames[j] for j in range(4)) == src[i]


def test_resize_media_stride_contract(spark, payloads):
    src = {r["id"]: r["payload"] for r in payloads.collect()}
    out = {r["id"]: r for r in resize_media(payloads, factor=4).collect()}
    for i, p in src.items():
        expect = byte_stride_resize(p, 4)
        assert bytes(out[i]["payload"]) == expect == p[::4]
        assert out[i]["n_bytes"] == len(expect)
