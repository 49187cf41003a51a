"""Native C++ audio runtime vs the pure-Python path in audio.py.

Differential tests: WAV decode (all supported sample formats, multi-channel
downmix), resampler parity with scipy.signal.resample_poly, and the threaded
batch loader's pad/trim + error-row semantics.
"""

import os
import struct
import wave

import numpy as np
import pytest

pytest.importorskip("asr_ttl_mtl_tpu.runtime.wav", reason="no C++ toolchain")

from asr_ttl_mtl_tpu import audio
from asr_ttl_mtl_tpu.runtime import wav as cwav


def write_wav(path, data, sr, sampwidth=2, channels=1):
    data = np.asarray(data)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        if sampwidth == 1:
            raw = (np.clip(data, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            raw = (np.clip(data, -1, 1) * 32767).astype("<i2").tobytes()
        elif sampwidth == 3:
            i32 = (np.clip(data, -1, 1) * ((1 << 23) - 1)).astype(np.int32)
            b = np.zeros((i32.size, 3), np.uint8)
            b[:, 0] = i32 & 0xFF
            b[:, 1] = (i32 >> 8) & 0xFF
            b[:, 2] = (i32 >> 16) & 0xFF
            raw = b.tobytes()
        else:
            raw = (np.clip(data, -1, 1) * (2**31 - 1)).astype("<i4").tobytes()
        w.writeframes(raw)


def write_float_wav(path, data, sr):
    data = np.asarray(data, np.float32)
    body = data.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(body)) + body)


@pytest.fixture
def sine(tmp_path):
    t = np.arange(16000) / 16000.0
    return np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5, tmp_path


class TestWavDecode:
    @pytest.mark.parametrize("sampwidth", [1, 2, 3, 4])
    def test_pcm_widths_match_python_reader(self, sine, sampwidth):
        data, tmp = sine
        p = str(tmp / f"w{sampwidth}.wav")
        write_wav(p, data, 16000, sampwidth=sampwidth)
        got, sr_got = cwav.read(p)
        want, sr_want = audio._read_wav(p)
        assert sr_got == sr_want == 16000
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_float32_wav(self, sine):
        data, tmp = sine
        p = str(tmp / "f32.wav")
        write_float_wav(p, data, 22050)
        got, sr = cwav.read(p)
        assert sr == 22050
        np.testing.assert_allclose(got, data, atol=1e-7)

    def test_stereo_downmix(self, sine):
        data, tmp = sine
        stereo = np.stack([data, -data * 0.25], 1).reshape(-1)
        p = str(tmp / "st.wav")
        write_wav(p, stereo, 16000, sampwidth=2, channels=2)
        got, _ = cwav.read(p)
        want, _ = audio._read_wav(p)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_bad_file(self, tmp_path):
        p = str(tmp_path / "junk.wav")
        with open(p, "wb") as f:
            f.write(b"this is not audio at all, not even close!")
        with pytest.raises(RuntimeError):
            cwav.read(p)


class TestResampler:
    @pytest.mark.parametrize("orig,target", [(44100, 16000), (22050, 16000),
                                             (8000, 16000), (48000, 16000)])
    def test_scipy_parity(self, orig, target):
        rng = np.random.RandomState(0)
        x = rng.randn(orig).astype(np.float32) * 0.3
        got = cwav.resample(x, orig, target)
        want = audio.resample(x, orig, target)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_identity(self):
        x = np.arange(100, dtype=np.float32)
        np.testing.assert_array_equal(cwav.resample(x, 16000, 16000), x)


class TestBatchLoader:
    def test_pad_trim_and_errors(self, sine, tmp_path):
        data, tmp = sine
        short = str(tmp / "short.wav")
        write_wav(short, data[:4000], 16000)
        long = str(tmp / "long.wav")
        write_wav(long, np.tile(data, 2), 16000)
        bad = str(tmp_path / "missing.wav")

        out, status = cwav.load_batch([short, long, bad], 16000, 16000, n_threads=2)
        assert out.shape == (3, 16000)
        assert status[0] == 4000 and status[1] == 32000 and status[2] < 0
        # short row zero-padded, long row trimmed, bad row zeroed
        assert np.all(out[0, 4000:] == 0) and np.any(out[0, :4000] != 0)
        want_long, _ = audio._read_wav(long)
        np.testing.assert_allclose(out[1], want_long[:16000], atol=1e-6)
        assert np.all(out[2] == 0)

    def test_resampling_in_batch(self, tmp_path):
        t = np.arange(44100) / 44100.0
        x = np.sin(2 * np.pi * 220 * t).astype(np.float32) * 0.4
        p = str(tmp_path / "cd.wav")
        write_wav(p, x, 44100)
        out, status = cwav.load_batch([p], 16000, 16000)
        decoded, sr = audio._read_wav(p)
        want = audio.resample(decoded, 44100, 16000)[:16000]
        np.testing.assert_allclose(out[0], want, atol=5e-5)

    def test_load_audio_uses_native(self, sine):
        data, tmp = sine
        p = str(tmp / "la.wav")
        write_wav(p, data, 16000)
        got = audio.load_audio(p)
        np.testing.assert_allclose(got, cwav.read(p)[0], atol=1e-7)
