"""Native FFmpeg codec shim: encode/decode round trips for the formats the
reference corpora use (flac — LibriSpeech, ogg, mp3 — CommonVoice, NIST
sph — TED-LIUM), and the load_wav integration."""
import struct

import numpy as np
import pytest

from rtvc_tpu.utils.io import load_wav, save_audio
from rtvc_tpu.utils.libav import (
    decode_audio,
    encode_audio,
    libav_supported,
)

pytestmark = pytest.mark.skipif(
    not libav_supported(), reason="librtvc_audio.so not built on this system"
)


def _tone(sr=16000, seconds=1.0, f=440.0):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


class TestRoundTrip:
    def test_flac_lossless_roundtrip(self, tmp_path):
        sr, wav = 16000, _tone()
        p = tmp_path / "t.flac"
        encode_audio(p, wav, sr)
        dec, dsr = decode_audio(p)
        assert dsr == sr and len(dec) == len(wav)
        # flac is lossless up to the encoder's s16 quantization
        np.testing.assert_allclose(dec, wav, atol=1.0 / 32767)

    @pytest.mark.parametrize("ext", [".mp3", ".ogg"])
    def test_lossy_roundtrip_preserves_signal(self, tmp_path, ext):
        sr, wav = 16000, _tone()
        p = tmp_path / f"t{ext}"
        encode_audio(p, wav, sr)
        dec, dsr = decode_audio(p, target_sr=sr)
        assert dsr == sr
        assert abs(len(dec) - len(wav)) < sr // 10
        # energy roughly preserved (lossy): compare RMS of the middle
        mid = slice(len(wav) // 4, len(wav) // 2)
        rms_in = float(np.sqrt(np.mean(wav[mid] ** 2)))
        rms_out = float(np.sqrt(np.mean(dec[mid] ** 2)))
        assert abs(rms_in - rms_out) / rms_in < 0.1

    def test_decode_resamples(self, tmp_path):
        sr, wav = 16000, _tone()
        p = tmp_path / "t.flac"
        encode_audio(p, wav, sr)
        dec, dsr = decode_audio(p, target_sr=8000)
        assert dsr == 8000
        assert abs(len(dec) - len(wav) // 2) < 32

    def test_stereo_downmix(self, tmp_path):
        """Stereo input decodes to mono (the shim converts layout)."""
        from scipy.io import wavfile

        sr = 16000
        left = _tone(f=440.0)
        right = _tone(f=880.0)
        stereo = np.stack([left, right], axis=1)
        p = tmp_path / "st.wav"
        wavfile.write(str(p), sr, (stereo * 32767).astype(np.int16))
        dec, dsr = decode_audio(p)
        assert dec.ndim == 1 and dsr == sr
        np.testing.assert_allclose(
            dec[: len(left)], (left + right) / 2, atol=2e-3
        )


class TestSph:
    def test_nist_sphere_decodes(self, tmp_path):
        """TED-LIUM ships NIST SPHERE audio (ref scripts/tedlium_transcript.py
        cuts it with sox); our shim decodes it in-process."""
        sr, wav = 16000, _tone()
        pcm = (wav * 32767).astype("<i2").tobytes()
        header = (
            "NIST_1A\n   1024\n"
            "sample_rate -i 16000\n"
            "channel_count -i 1\n"
            "sample_n_bytes -i 2\n"
            f"sample_count -i {len(wav)}\n"
            "sample_byte_format -s2 01\n"
            "sample_coding -s3 pcm\n"
            "end_head\n"
        ).encode("ascii")
        p = tmp_path / "talk.sph"
        p.write_bytes(header + b" " * (1024 - len(header)) + pcm)
        dec, dsr = decode_audio(p)
        assert dsr == sr
        # s16 quantization + the /32768-vs-/32767 float convention
        np.testing.assert_allclose(dec[: len(wav)], wav, atol=1e-4)


class TestIoIntegration:
    def test_load_wav_reads_flac(self, tmp_path):
        sr, wav = 16000, _tone()
        p = tmp_path / "u.flac"
        save_audio(wav, p, sr)
        loaded, lsr = load_wav(p, target_sr=sr)
        assert lsr == sr
        np.testing.assert_allclose(loaded, wav, atol=1.0 / 32767)

    def test_load_wav_reads_reference_mp3_sample(self):
        """The actual reference benchmark prompt (samples/*.mp3)."""
        from rtvc_tpu.utils.io import sample_path

        wav, sr = load_wav(sample_path("p240_00000.mp3"), target_sr=16000)
        assert sr == 16000 and len(wav) > 16000
        assert float(np.abs(wav).max()) <= 1.0


class TestRobustness:
    """Corrupt/hostile inputs must raise clean Python errors — never crash
    the process (the shim returns error codes; avformat probes safely)."""

    def test_garbage_bytes(self, tmp_path):
        p = tmp_path / "junk.flac"
        p.write_bytes(b"\x00\xff" * 500)
        with pytest.raises(RuntimeError):
            decode_audio(p)

    def test_empty_file(self, tmp_path):
        p = tmp_path / "empty.ogg"
        p.write_bytes(b"")
        with pytest.raises(RuntimeError):
            decode_audio(p)

    def test_truncated_flac(self, tmp_path):
        sr, n = 16000, 16000
        wav = (0.4 * np.sin(2 * np.pi * 330 * np.arange(n) / sr)).astype(
            np.float32
        )
        p = tmp_path / "t.flac"
        encode_audio(p, wav, sr)
        data = p.read_bytes()
        (tmp_path / "trunc.flac").write_bytes(data[: len(data) // 3])
        # either a clean error or a shortened decode — never a crash
        try:
            dec, _ = decode_audio(tmp_path / "trunc.flac")
            assert len(dec) <= n
        except RuntimeError:
            pass

    def test_missing_file(self):
        with pytest.raises(RuntimeError, match="cannot open"):
            decode_audio("/nonexistent/nope.flac")

    def test_encode_bad_extension(self, tmp_path):
        with pytest.raises(RuntimeError):
            encode_audio(tmp_path / "x.notaformat", np.zeros(100, np.float32),
                         16000)
