"""ctypes wrapper over the native FFmpeg shim (librtvc_audio.so).

Decodes every container/codec the system FFmpeg knows (flac — LibriSpeech;
m4a/aac — VoxCeleb2; ogg/vorbis/opus; NIST .sph — TED-LIUM; mp3; wav) to
mono float32, and encodes mono float32 to flac/mp3/ogg/wav. This replaces
the reference's librosa/audioread load path and its ffmpeg-subprocess
conversion scripts (ref: encoder/audio.py:22-30, scripts/convert.sh,
scripts/commonvoice_transcript.py).

The shim is built by rtvc_tpu/native/build.sh; everything here degrades
gracefully (``libav_supported() == False``) if it is absent.
"""
from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[1] / "native" / "build" / "librtvc_audio.so"

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            # try building it once (cheap: one gcc invocation) — announced,
            # and failures surfaced rather than silently swallowed
            import logging
            import subprocess

            log = logging.getLogger(__name__)
            build = _LIB_PATH.parents[1] / "build.sh"
            if build.exists():
                log.warning(
                    "librtvc_audio.so missing — auto-building via %s "
                    "(one-off gcc compile)", build,
                )
                proc = subprocess.run(
                    [str(build)], capture_output=True, timeout=300, check=False
                )
                if proc.returncode != 0 or not _LIB_PATH.exists():
                    log.warning(
                        "native audio shim build failed (exit %d):\n%s",
                        proc.returncode,
                        proc.stderr.decode(errors="replace")[-2000:],
                    )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.rtvc_decode_audio.restype = ctypes.c_int
        lib.rtvc_decode_audio.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.rtvc_encode_audio.restype = ctypes.c_int
        lib.rtvc_encode_audio.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.rtvc_free_buf.restype = None
        lib.rtvc_free_buf.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def libav_supported() -> bool:
    return _load() is not None


def decode_audio(
    path, target_sr: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Decode any FFmpeg-supported audio file → (float32 mono wav, sr)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "librtvc_audio.so is not available (FFmpeg headers were missing "
            "at build time); run rtvc_tpu/native/build.sh"
        )
    data = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    rc = lib.rtvc_decode_audio(
        str(path).encode(), int(target_sr or 0), ctypes.byref(data),
        ctypes.byref(n), ctypes.byref(sr), err, len(err),
    )
    if rc != 0:
        raise RuntimeError(
            f"decode failed: {err.value.decode(errors='replace')}"
        )
    try:
        wav = np.ctypeslib.as_array(data, shape=(n.value,)).copy()
    finally:
        lib.rtvc_free_buf(data)
    return wav, sr.value


def encode_audio(path, wav: np.ndarray, sample_rate: int) -> None:
    """Encode mono float32 PCM; codec/container from the extension
    (.flac/.mp3/.ogg/.wav)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "librtvc_audio.so is not available; run rtvc_tpu/native/build.sh"
        )
    wav = np.ascontiguousarray(np.asarray(wav, dtype=np.float32))
    err = ctypes.create_string_buffer(256)
    rc = lib.rtvc_encode_audio(
        str(path).encode(),
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(wav), int(sample_rate), err, len(err),
    )
    if rc != 0:
        raise RuntimeError(
            f"encode failed: {err.value.decode(errors='replace')}"
        )
