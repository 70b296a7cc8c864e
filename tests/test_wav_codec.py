"""Real WAV codec (operators/multimodal.py): stdlib ``wave`` decode
round-tripped against the stdlib encoder at every supported width and
channel count, nearest-neighbor resampling, and the Spark mapInPandas
path over GENUINE WAV payloads — rate/duration/RMS must come from
actual PCM frames, not payload bytes."""

import numpy as np
import pytest

from gene_etl_spark.operators.multimodal import (
    decode_audio,
    decode_audio_media,
    decode_wav,
    encode_wav,
    fake_decode_audio,
    is_wav,
    resample_audio,
)


def _sine(n, freq, rate, amp, channels, dtype):
    t = np.arange(n) / rate
    base = amp * np.sin(2 * np.pi * freq * t)
    s = np.stack([np.roll(base, c) for c in range(channels)], axis=1)
    return np.round(s).astype(dtype)


def test_roundtrip_every_width_and_channel_count():
    rate = 16_000
    for width, amp, dtype in ((1, 100, np.int32), (2, 30_000, np.int32), (4, 2**30, np.int64)):
        for channels in (1, 2):
            s = _sine(1000, 440, rate, amp, channels, dtype)
            payload = encode_wav(s, rate, sample_width=width)
            assert is_wav(payload)
            d = decode_wav(payload)
            assert d["sample_rate"] == rate
            assert d["n_channels"] == channels
            assert d["sample_width"] == width
            assert d["n_frames"] == 1000
            assert d["duration_sec"] == pytest.approx(1000 / rate)
            assert (d["samples"] == s).all(), f"width={width} ch={channels}"
            assert np.abs(d["norm"]).max() <= 1.0


def test_unsupported_and_malformed_raise():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="width 3"):
        encode_wav(np.zeros(10, dtype=np.int32), 8000, sample_width=3)
    # hand-build a 24-bit header: decode must refuse, not misparse
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(b"\x00" * 30)
    with pytest.raises(NotImplementedError, match="width 3"):
        decode_wav(buf.getvalue())


def test_resample_nearest_neighbor():
    ramp = np.arange(100, dtype=np.int32)[:, None]
    down = resample_audio(ramp, 16_000, 8_000)
    assert down.shape == (50, 1)
    assert (down[:, 0] == np.arange(0, 100, 2)).all()
    up = resample_audio(ramp, 8_000, 16_000)
    assert up.shape == (200, 1)
    assert up[0, 0] == 0 and up[-1, 0] == 99
    same = resample_audio(ramp, 8_000, 8_000)
    assert same is ramp
    # empty input stays empty (no IndexError from the n_out>=1 floor)
    empty = np.zeros((0, 2), dtype=np.int32)
    assert resample_audio(empty, 16_000, 8_000).shape == (0, 2)


def test_decode_audio_features_from_real_frames():
    rate = 8_000
    s = _sine(4000, 220, rate, 20_000, 1, np.int32)
    feats = decode_audio(encode_wav(s, rate, sample_width=2))
    assert feats["sample_rate"] == rate
    assert feats["n_channels"] == 1
    assert feats["n_frames"] == 4000
    assert feats["duration_sec"] == pytest.approx(0.5)
    # RMS of a full-cycle sine is amp/sqrt(2), normalized by 2^15
    assert feats["rms"] == pytest.approx(20_000 / 32768 / np.sqrt(2), rel=1e-3)


def test_stub_dispatch_for_non_wav():
    payload = bytes(range(16))
    feats = decode_audio(payload)
    assert feats == fake_decode_audio(payload)
    assert feats["sample_rate"] == 8000 and feats["n_frames"] == 16
    with pytest.raises(NotImplementedError):
        decode_audio(b"")


def test_spark_decode_audio_media_mixed_payloads(spark):
    rate = 16_000
    wav_a = encode_wav(_sine(800, 440, rate, 25_000, 2, np.int32), rate, 2)
    wav_b = encode_wav(_sine(1600, 110, rate, 90, 1, np.int32), rate, 1)
    stub = bytes(range(32))
    df = spark.createDataFrame(
        [(1, bytearray(wav_a)), (2, bytearray(wav_b)), (3, bytearray(stub))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r.asDict() for r in decode_audio_media(df).collect()}
    assert rows[1]["sample_rate"] == rate and rows[1]["n_channels"] == 2
    assert rows[1]["n_frames"] == 800
    assert rows[1]["duration_sec"] == pytest.approx(800 / rate)
    assert rows[1]["rms"] == pytest.approx(25_000 / 32768 / np.sqrt(2), rel=1e-2)
    assert rows[2]["n_channels"] == 1 and rows[2]["n_frames"] == 1600
    assert rows[3]["sample_rate"] == 8000 and rows[3]["n_frames"] == 32


def test_registry_entry_runs_oracle_gated(spark):
    """Since round 6 the audio entry is oracle-gated: payloads are real
    WAV bytes from the trig-free synth waveform, with a DuckDB twin."""
    from gene_etl_spark.queries import all_queries

    q, o = all_queries()
    assert "multimodal_audio" in q and "multimodal_audio" in o
    out = q["multimodal_audio"](spark, "/root/testdata/sf0.001")
    assert out.columns == [
        "doc_id", "sample_rate", "n_channels", "n_frames", "duration_sec", "rms",
    ]
    assert out.count() > 0


# two-tier test policy (round 7): this module is in the smoke tier
pytestmark = pytest.mark.smoke
