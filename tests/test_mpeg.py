"""mp3 decode path (libmpg123 ctypes binding, rtvc_tpu/utils/mpeg.py).

The reference consumes mp3 everywhere via librosa/audioread (ref:
encoder/audio.py:22-30, demo_cli.py:50); these tests prove the rebuilt
decode path against a known signal round-tripped through libmp3lame and
against the actual reference sample corpus.
"""
from pathlib import Path

import numpy as np
import pytest

from rtvc_tpu.utils import mpeg
from rtvc_tpu.utils.io import load_wav

# prefer the in-repo fixture mirror (samples/README.md); fall back to the
# upstream tree for the files the mirror doesn't carry
SAMPLES = Path(__file__).resolve().parents[1] / "samples"
if not any(SAMPLES.glob("*.mp3")):
    SAMPLES = Path("/root/reference/samples")

pytestmark = pytest.mark.skipif(
    not mpeg.mpeg_supported(), reason="libmpg123 not present"
)


def _align_corr(ref: np.ndarray, dec: np.ndarray, max_lag: int = 4000) -> float:
    """Max normalized cross-correlation over ± max_lag (mp3 adds codec delay)."""
    best = -1.0
    n = min(len(ref), len(dec)) - max_lag
    assert n > 1000
    a = ref[:n]
    a = a / (np.linalg.norm(a) + 1e-9)
    for lag in range(0, max_lag, 16):
        b = dec[lag : lag + n]
        b = b / (np.linalg.norm(b) + 1e-9)
        best = max(best, float(np.dot(a, b)))
    return best


@pytest.mark.skipif(not mpeg.lame_supported(), reason="libmp3lame not present")
def test_mp3_roundtrip_known_signal(tmp_path):
    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (
        0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 570 * t)
    ).astype(np.float32)
    path = tmp_path / "tone.mp3"
    mpeg.encode_mpeg(wav, sr, path)
    assert path.stat().st_size > 1000

    dec, dec_sr = mpeg.decode_mpeg(path)
    assert dec_sr == sr
    # Same length within codec padding, and the waveform survives the codec.
    assert abs(len(dec) - len(wav)) < 5000
    assert _align_corr(wav, dec) > 0.95


@pytest.mark.skipif(not SAMPLES.exists(), reason="reference samples absent")
def test_reference_sample_corpus_decodes():
    got = {}
    for f in sorted(SAMPLES.glob("*.mp3")):
        wav, sr = mpeg.decode_mpeg(f)
        assert np.isfinite(wav).all()
        assert 0.05 < np.abs(wav).max() <= 1.5, f
        assert 3.0 < len(wav) / sr < 8.0, f  # all samples ~5 s of speech
        got[f.name] = sr
    # in-repo mirror carries 3 fixtures; the full upstream corpus has 6
    assert len(got) >= 3
    # LibriSpeech samples are 16 kHz, VCTK 24 kHz in this corpus.
    assert got["1320_00000.mp3"] == 16000
    assert got["p240_00000.mp3"] == 24000


@pytest.mark.skipif(not SAMPLES.exists(), reason="reference samples absent")
def test_load_wav_resamples_mp3():
    wav, sr = load_wav(SAMPLES / "p240_00000.mp3", target_sr=16000)
    assert sr == 16000
    assert wav.dtype == np.float32
    assert 60000 < len(wav) < 90000  # ~5 s at 16 kHz
