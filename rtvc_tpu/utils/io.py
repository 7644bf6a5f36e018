"""Audio file I/O (host side).

The reference loads with librosa/audioread (any backend) and writes with
scipy/soundfile (ref: synthesizer/audio.py:10-19, vocoder/audio.py:19-24).
Here: WAV via scipy (all integer/float PCM subtypes) and mp3 via the system
libmpg123 (rtvc_tpu.utils.mpeg), with resampling on load; other compressed
formats (flac/ogg) are gated — no decoder ships in this image — and raise a
clear error listing alternatives.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
from scipy.io import wavfile

from rtvc_tpu.ops.resample import resample

PathLike = Union[str, Path]

_MPEG = {".mp3", ".mp2"}
_UNSUPPORTED = {".flac", ".ogg", ".m4a", ".aac", ".opus", ".wma"}


class UnsupportedAudioFormat(RuntimeError):
    pass


def _to_float32(data: np.ndarray) -> np.ndarray:
    """Convert integer PCM to float32 in [-1, 1)."""
    if data.dtype == np.float32:
        return data
    if data.dtype == np.float64:
        return data.astype(np.float32)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    if data.dtype == np.uint8:
        return ((data.astype(np.float32) - 128.0) / 128.0).astype(np.float32)
    raise UnsupportedAudioFormat(f"Unsupported WAV sample dtype: {data.dtype}")


def load_wav(
    path: PathLike, target_sr: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Load an audio file → (float32 mono waveform, sample_rate).

    If ``target_sr`` is given the waveform is resampled to it.
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in _MPEG:
        from rtvc_tpu.utils import mpeg

        if not mpeg.mpeg_supported():
            raise UnsupportedAudioFormat(
                f"{suffix} needs libmpg123, which was not found on this "
                f"system. Convert {path.name} to WAV first."
            )
        wav, sr = mpeg.decode_mpeg(path)
    elif suffix in _UNSUPPORTED:
        raise UnsupportedAudioFormat(
            f"No decoder for {suffix} is available in this environment. "
            f"Convert {path.name} to WAV first (e.g. with ffmpeg on another "
            f"machine), or pass a numpy waveform directly."
        )
    else:
        sr, data = wavfile.read(str(path))
        wav = _to_float32(np.asarray(data))
    if wav.ndim == 2:  # downmix channels
        wav = wav.mean(axis=1)
    if target_sr is not None and sr != target_sr:
        wav = resample(wav, sr, target_sr)
        sr = target_sr
    return wav.astype(np.float32), int(sr)


def save_wav(wav: np.ndarray, path: PathLike, sample_rate: int) -> None:
    """Peak-normalize to int16 and write (ref: synthesizer/audio.py:14-16)."""
    wav = np.asarray(wav, dtype=np.float32)
    scaled = wav * (32767.0 / max(0.01, float(np.max(np.abs(wav)))))
    wavfile.write(str(path), sample_rate, scaled.astype(np.int16))


def save_wav_float(wav: np.ndarray, path: PathLike, sample_rate: int) -> None:
    """Write float32 PCM without rescaling (ref: synthesizer/audio.py:18-19)."""
    wavfile.write(str(path), sample_rate, np.asarray(wav, dtype=np.float32))
