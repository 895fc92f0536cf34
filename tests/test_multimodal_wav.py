"""Real WAV decode (round-3 upgrade of the multimodal decode stub):
synthetic_wav_media emits genuine RIFF/WAVE PCM16 payloads and
wav_amplitude_stats decodes them with the stdlib wave reader inside
mapInPandas — real bytes in, real decode out, no external libs.
"""

from __future__ import annotations

import io
import wave

import numpy as np

from sketchlib.multimodal import synthetic_wav_media, wav_amplitude_stats


def _expected(i: int, seed: int = 42):
    ns = 64 + (i * 31) % 192
    k = np.arange(ns, dtype=np.int64)
    s = (i * 7919 + k * 104729 + seed) % 65536 - 32768
    return ns, s


def test_payloads_are_real_wav(spark):
    rows = synthetic_wav_media(spark, 5, partitions=2).collect()
    assert len(rows) == 5
    for r in rows:
        with wave.open(io.BytesIO(bytes(r["payload"]))) as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == 8000
            ns, s = _expected(r["media_id"])
            assert w.getnframes() == ns
            got = np.frombuffer(w.readframes(ns), dtype="<i2")
            assert np.array_equal(got.astype(np.int64), s)


def test_decode_stats_match_closed_form(spark):
    media = synthetic_wav_media(spark, 40, partitions=4)
    got = {r["media_id"]: r for r in wav_amplitude_stats(media).collect()}
    assert len(got) == 40
    for i in range(40):
        ns, s = _expected(i)
        r = got[i]
        assert r["n_samples"] == ns
        assert r["sample_rate"] == 8000
        assert r["sum_abs"] == int(np.abs(s).sum())
        assert r["max_abs"] == int(np.abs(s).max())
        assert r["sum_sq"] == int((s * s).sum())
