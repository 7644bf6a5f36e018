"""Speaker-encoder inference — public API surface.

Mirrors the reference's module API (ref: encoder/inference.py): ``load_model``,
``is_loaded``, ``embed_frames_batch``, ``compute_partial_slices``,
``embed_utterance``, ``embed_speaker``, plus ``preprocess_wav`` re-exported.

TPU-native design: the mel frontend + LSTM forward is one jitted XLA graph;
partial-utterance batches are padded to power-of-two buckets so long/short
utterances share a handful of compiled shapes instead of recompiling per
length (XLA static-shape discipline).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
from rtvc_tpu.models.speaker_encoder import SpeakerEncoder, import_torch_state
from rtvc_tpu.ops.audio import encoder_mel_spectrogram, normalize_volume
from rtvc_tpu.ops.resample import resample
from rtvc_tpu.ops.vad import trim_long_silences
from rtvc_tpu.train.checkpoints import load_checkpoint
from rtvc_tpu.utils.io import load_wav

_data = EncoderDataParams()
_model_cfg = EncoderModelParams()

_model: Optional[SpeakerEncoder] = None
_params = None


def load_model(weights_fpath: Union[str, Path], device=None, use_tqdm: bool = False):
    """Load encoder weights (native .ckpt or reference torch .pt).

    ``device`` is accepted for API compatibility and ignored — JAX placement
    is controlled by the platform (ref signature: encoder/inference.py:16).
    """
    global _model, _params, _model_cfg, _data
    ckpt = load_checkpoint(weights_fpath)
    # Checkpoints written by train_encoder carry their architecture config —
    # recover it so non-default models reload exactly (cf. the synthesizer /
    # vocoder checkpoint contract).
    extras = ckpt.get("extras") or {}
    cfg = extras.get("config")
    if cfg:
        _model_cfg = EncoderModelParams(**cfg["model"])
        _data = EncoderDataParams(**cfg["data"])
    _model = SpeakerEncoder(model=_model_cfg, data=_data)
    if ckpt.get("torch_state") is not None:
        state = import_torch_state(ckpt["torch_state"])
        _params = {"params": state["params"]}
    else:
        params = ckpt["params"]
        if isinstance(params, dict) and set(params) == {"model", "similarity"}:
            # train_encoder saves {model, similarity(GE2E w,b)} — inference
            # only needs the model tree.
            params = params["model"]
        _params = {"params": params}
    print(
        'Loaded encoder "%s" trained to step %d'
        % (Path(weights_fpath).name, ckpt["step"])
    )
    return _model


def init_random_model(seed: int = 0):
    """Initialize with random weights (for self-tests and benchmarking)."""
    global _model, _params
    _model = SpeakerEncoder(model=_model_cfg, data=_data)
    dummy = jnp.zeros((1, _data.partials_n_frames, _data.mel_n_channels))
    _params = {"params": _model.init(jax.random.PRNGKey(seed), dummy)["params"]}
    return _model


def is_loaded() -> bool:
    return _model is not None


@functools.partial(jax.jit, static_argnames=("model_cfg", "data_cfg"))
def _forward(params, frames: jax.Array, model_cfg, data_cfg) -> jax.Array:
    model = SpeakerEncoder(model=model_cfg, data=data_cfg)
    return model.apply(params, frames)


def _bucket_size(n: int) -> int:
    """Next power of two ≥ n (caps recompilation to O(log max_batch) shapes)."""
    b = 1
    while b < n:
        b *= 2
    return b


def embed_frames_batch(frames_batch: np.ndarray) -> np.ndarray:
    """(B, n_frames, n_channels) mel frames → (B, E) embeddings
    (ref: encoder/inference.py:48-61)."""
    if _params is None:
        raise Exception("Model was not loaded. Call load_model() before inference.")
    n = frames_batch.shape[0]
    bucket = _bucket_size(n)
    if bucket != n:
        pad = np.zeros((bucket - n,) + frames_batch.shape[1:], frames_batch.dtype)
        frames_batch = np.concatenate([frames_batch, pad], axis=0)
    embeds = np.asarray(
        _forward(_params, jnp.asarray(frames_batch), _model_cfg, _data)
    )
    return embeds[:n]


def compute_partial_slices(
    n_samples: int,
    partial_utterance_n_frames: Optional[int] = None,
    min_pad_coverage: float = 0.75,
    overlap: float = 0.5,
) -> Tuple[List[slice], List[slice]]:
    """Split an utterance into overlapping partial-utterance windows.

    Host-side slicing logic with the reference's exact semantics
    (ref: encoder/inference.py:64-113): 160-frame windows, 50% overlap, the
    trailing window kept only if it covers ≥75% after padding.
    ``partial_utterance_n_frames`` defaults to the *currently installed*
    config's ``partials_n_frames`` (resolved at call time, so a checkpoint
    that overrides it is honoured).
    """
    if partial_utterance_n_frames is None:
        partial_utterance_n_frames = _data.partials_n_frames
    assert 0 <= overlap < 1
    assert 0 < min_pad_coverage <= 1

    samples_per_frame = int(_data.sampling_rate * _data.mel_window_step / 1000)
    n_frames = int(np.ceil((n_samples + 1) / samples_per_frame))
    frame_step = max(int(np.round(partial_utterance_n_frames * (1 - overlap))), 1)

    wav_slices, mel_slices = [], []
    steps = max(1, n_frames - partial_utterance_n_frames + frame_step + 1)
    for i in range(0, steps, frame_step):
        mel_range = np.array([i, i + partial_utterance_n_frames])
        wav_range = mel_range * samples_per_frame
        mel_slices.append(slice(*mel_range))
        wav_slices.append(slice(*wav_range))

    last_wav_range = wav_slices[-1]
    coverage = (n_samples - last_wav_range.start) / (
        last_wav_range.stop - last_wav_range.start
    )
    if coverage < min_pad_coverage and len(mel_slices) > 1:
        mel_slices = mel_slices[:-1]
        wav_slices = wav_slices[:-1]

    return wav_slices, mel_slices


def wav_to_mel_spectrogram(wav: np.ndarray) -> np.ndarray:
    """Encoder-frontend mel frames (T, 40) (ref: encoder/audio.py:63-75)."""
    n_fft = int(_data.sampling_rate * _data.mel_window_length / 1000)
    hop = int(_data.sampling_rate * _data.mel_window_step / 1000)
    return np.asarray(
        encoder_mel_spectrogram(
            jnp.asarray(wav), _data.sampling_rate, n_fft, hop, _data.mel_n_channels
        ),
        dtype=np.float32,
    )


def preprocess_wav(
    fpath_or_wav: Union[str, Path, np.ndarray],
    source_sr: Optional[int] = None,
    normalize: bool = True,
    trim_silence: bool = True,
) -> np.ndarray:
    """Load/resample → volume-normalize → VAD silence trim
    (ref: encoder/audio.py:20-60)."""
    if isinstance(fpath_or_wav, (str, Path)):
        wav, source_sr = load_wav(fpath_or_wav)
    else:
        wav = np.asarray(fpath_or_wav, dtype=np.float32)

    if source_sr is not None and source_sr != _data.sampling_rate:
        wav = resample(wav, source_sr, _data.sampling_rate)

    if normalize:
        wav = np.asarray(
            normalize_volume(
                jnp.asarray(wav), _data.audio_norm_target_dBFS, increase_only=True
            )
        )
    if trim_silence:
        wav = trim_long_silences(
            wav,
            _data.sampling_rate,
            _data.vad_window_length,
            _data.vad_moving_average_width,
            _data.vad_max_silence_length,
        )
    return wav.astype(np.float32)


def embed_utterance(
    wav: np.ndarray,
    using_partials: bool = True,
    return_partials: bool = False,
    **kwargs,
):
    """Single-utterance embedding (ref: encoder/inference.py:116-160)."""
    if not using_partials:
        frames = wav_to_mel_spectrogram(wav)
        embed = embed_frames_batch(frames[None, ...])[0]
        if return_partials:
            return embed, None, None
        return embed

    wave_slices, mel_slices = compute_partial_slices(len(wav), **kwargs)
    max_wave_length = wave_slices[-1].stop
    if max_wave_length >= len(wav):
        wav = np.pad(wav, (0, max_wave_length - len(wav)), "constant")

    frames = wav_to_mel_spectrogram(wav)
    frames_batch = np.stack([frames[s] for s in mel_slices])
    partial_embeds = embed_frames_batch(frames_batch)

    raw_embed = np.mean(partial_embeds, axis=0)
    embed = raw_embed / np.linalg.norm(raw_embed, 2)

    if return_partials:
        return embed, partial_embeds, wave_slices
    return embed


def embed_speaker(wavs: List[np.ndarray], **kwargs) -> np.ndarray:
    """Speaker-level embedding: mean of per-utterance embeddings, renormalized.

    (The reference leaves this unimplemented — ref: encoder/inference.py:163;
    implemented here since the toolbox wants it.)
    """
    partials = [embed_utterance(w, **kwargs) for w in wavs]
    raw = np.mean(np.stack(partials), axis=0)
    return raw / np.linalg.norm(raw, 2)


def plot_embedding_as_heatmap(embed, ax=None, title="", shape=None, color_range=(0, 0.30)):
    """Embedding heatmap (ref: encoder/inference.py:168-183)."""
    import matplotlib
    import matplotlib.pyplot as plt
    from matplotlib import cm

    if ax is None:
        ax = plt.gca()
    if shape is None:
        height = int(len(embed) / 16)
        shape = (height, -1)
    embed = np.asarray(embed).reshape(shape)
    cmap = matplotlib.colormaps[matplotlib.rcParams["image.cmap"]]
    mappable = ax.imshow(embed, cmap=cmap)
    plt.colorbar(mappable, ax=ax, fraction=0.046, pad=0.04)
    sm = cm.ScalarMappable(cmap=cmap)
    sm.set_clim(*color_range)
    ax.set_xticks([]), ax.set_yticks([])
    ax.set_title(title)
