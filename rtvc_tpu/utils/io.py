"""Audio file I/O (host side).

The reference loads with librosa/audioread (any backend) and writes with
scipy/soundfile (ref: synthesizer/audio.py:10-19, vocoder/audio.py:19-24).
Here: WAV via scipy (all integer/float PCM subtypes), mp3 via the system
libmpg123 (rtvc_tpu.utils.mpeg), and everything else (flac — LibriSpeech,
m4a — VoxCeleb2, ogg/opus, NIST .sph — TED-LIUM, ...) via the native FFmpeg
shim (rtvc_tpu.utils.libav), with resampling on load. If the shim is
unavailable, compressed formats raise a clear error listing alternatives.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
from scipy.io import wavfile

from rtvc_tpu.ops.resample import resample

PathLike = Union[str, Path]

_MPEG = {".mp3", ".mp2"}
_COMPRESSED = {".flac", ".ogg", ".m4a", ".aac", ".opus", ".wma", ".sph",
               ".webm", ".mp4", ".mka"}


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
        from rtvc_tpu.utils import libav, mpeg

        if mpeg.mpeg_supported():
            wav, sr = mpeg.decode_mpeg(path)
        elif libav.libav_supported():
            wav, sr = libav.decode_audio(path)
        else:
            raise UnsupportedAudioFormat(
                f"{suffix} needs libmpg123 or FFmpeg libraries, neither of "
                f"which was found on this system. Convert {path.name} to WAV "
                f"first."
            )
    elif suffix in _COMPRESSED:
        from rtvc_tpu.utils import libav

        if not libav.libav_supported():
            raise UnsupportedAudioFormat(
                f"No decoder for {suffix} is available in this environment "
                f"(the native FFmpeg shim did not build). Convert "
                f"{path.name} to WAV first, or pass a numpy waveform "
                f"directly."
            )
        wav, sr = libav.decode_audio(path)
    else:
        sr, data = wavfile.read(str(path))
        wav = _to_float32(np.asarray(data))
    if wav.ndim == 2:  # downmix channels
        wav = wav.mean(axis=1)
    if target_sr is not None and sr != target_sr:
        wav = resample(wav, sr, target_sr)
        sr = target_sr
    return wav.astype(np.float32), int(sr)


def sample_path(name: str) -> Path:
    """Resolve a test/bench audio fixture by filename.

    Prefers the in-repo ``samples/`` mirror (CC BY 4.0, see
    samples/README.md — the reference ships the same utterances "for
    toolbox testing and benchmarking", ref samples/README.md:1-5), falling
    back to the upstream reference tree when the repo copy lacks the file.
    Raises FileNotFoundError naming both locations otherwise."""
    candidates = [
        Path(__file__).resolve().parents[2] / "samples" / name,
        Path("/root/reference/samples") / name,
    ]
    for c in candidates:
        if c.is_file():
            return c
    raise FileNotFoundError(
        f"audio fixture {name!r} not found in any of: "
        + ", ".join(str(c.parent) for c in candidates)
    )


def save_wav(wav: np.ndarray, path: PathLike, sample_rate: int) -> None:
    """Peak-normalize to int16 and write (ref: synthesizer/audio.py:14-16)."""
    wav = np.asarray(wav, dtype=np.float32)
    scaled = wav * (32767.0 / max(0.01, float(np.max(np.abs(wav)))))
    wavfile.write(str(path), sample_rate, scaled.astype(np.int16))


def save_wav_float(wav: np.ndarray, path: PathLike, sample_rate: int) -> None:
    """Write float32 PCM without rescaling (ref: synthesizer/audio.py:18-19)."""
    wavfile.write(str(path), sample_rate, np.asarray(wav, dtype=np.float32))


def save_audio(wav: np.ndarray, path: PathLike, sample_rate: int) -> None:
    """Write in the format implied by the extension: WAV in-process, other
    formats (.flac/.mp3/.ogg) through the native FFmpeg shim (used by the
    dataset adapters that emit flac, e.g. scripts/commonvoice_transcript.py;
    ref converts via an ffmpeg subprocess)."""
    path = Path(path)
    if path.suffix.lower() in ("", ".wav"):
        save_wav_float(wav, path, sample_rate)
        return
    from rtvc_tpu.utils import libav

    if not libav.libav_supported():
        raise UnsupportedAudioFormat(
            f"No encoder for {path.suffix} in this environment — write .wav "
            f"instead, or build rtvc_tpu/native/build.sh"
        )
    libav.encode_audio(path, wav, sample_rate)
