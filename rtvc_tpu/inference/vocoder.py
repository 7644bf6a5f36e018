"""Vocoder inference — public API surface (ref: vocoder/inference.py).

``load_model`` / ``is_loaded`` / ``infer_waveform`` / ``set_seed`` with the
same dual-backend dispatch: the JAX/XLA path (``voc_type='pytorch'`` kept as
the compat name) and the native C++ engine (``voc_type='libwavernn'``,
see rtvc_tpu/native)."""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

from rtvc_tpu.config import signal as _sig
from rtvc_tpu.config import vocoder as _voc_cfg
from rtvc_tpu.models import factories as base
from rtvc_tpu.models.wavernn import import_torch_state, wavernn_generate
from rtvc_tpu.train.checkpoints import load_checkpoint

_model: Optional[base.VocModel] = None
_model_type: Optional[str] = None
_cpp_model = None
_seed: int = 0
_gen_counter: int = 0

# Generation backend knobs. use_pallas None = auto: the fused Pallas kernel
# on TPU (the headline-perf path), the XLA scan elsewhere. On any Pallas
# failure (e.g. fatchord-512 f32 weights exceed the 16 MB VMEM scoped limit)
# we fall back to XLA once and remember.
_use_pallas: Optional[bool] = None
# TPU-tuned default fold window: generation wall-time scales with window
# length while folds are near-free batch parallelism, so TPU wants far
# smaller windows than the checkpoints' CPU-tuned gen_target/gen_overlap
# (6000/1000 etc.). 400/160 is chosen on evidence: fold-fidelity metrics
# (utils/genquality.py; BENCHMARKS.md quality table) show joins as clean as
# the reference windows, at ~6.8 MHz device rate vs ~4.9 MHz for 1000/400.
# The default only kicks in when a TPU is the active device — on CPU/GPU the
# fold batch is NOT free and the checkpoint's own gen_target/gen_overlap win.
# set_generation_options(target=None, overlap=None) restores the
# checkpoint values (reference parity mode) everywhere.
_default_target: int | None = 400
_default_overlap: int | None = 160
# user-set windows (via set_generation_options) are honored on every
# backend; only the module's TPU-tuned default is TPU-conditional.
# Tracked PER KNOB: setting only the overlap must not drag the TPU-tuned
# target onto a CPU backend (review r3).
_target_user_set = False
_overlap_user_set = False
_compute_dtype = None
_stream_dtype = None
_pallas_broken = False


_UNSET = object()


def set_generation_options(use_pallas: Optional[bool] = None,
                           compute_dtype=None,
                           target=_UNSET,
                           overlap=_UNSET,
                           stream_dtype=_UNSET):
    """Override generation backend defaults. ``use_pallas``: True/False to
    force, None to restore auto (TPU → Pallas). ``compute_dtype``: dtype for
    resident weights in the generate graph (e.g. ``jnp.bfloat16`` halves the
    Pallas VMEM footprint — required for fatchord-512, and adds ~15% rate).
    ``target``/``overlap``: default fold window; pass None to fall back to
    the checkpoint's CPU-tuned ``gen_target``/``gen_overlap`` (reference
    parity mode). ``stream_dtype``: dtype of the per-step conditioning
    streams in the Pallas kernel — default bf16 (the measured +36%
    bandwidth win); pass ``jnp.float32`` for reference-parity numerics."""
    global _use_pallas, _compute_dtype, _pallas_broken
    global _default_target, _default_overlap, _stream_dtype
    global _target_user_set, _overlap_user_set
    _use_pallas = use_pallas
    _compute_dtype = compute_dtype
    if target is not _UNSET:
        _default_target = target
        _target_user_set = True
    if overlap is not _UNSET:
        _default_overlap = overlap
        _overlap_user_set = True
    if stream_dtype is not _UNSET:
        _stream_dtype = stream_dtype
    _pallas_broken = False


def _gen_backend():
    import jax.numpy as jnp

    dtype = _compute_dtype if _compute_dtype is not None else jnp.float32
    sdtype = _stream_dtype if _stream_dtype is not None else jnp.bfloat16
    if _use_pallas is not None:
        return (_use_pallas and not _pallas_broken), dtype, sdtype
    is_tpu = jax.devices()[0].platform == "tpu"
    return (is_tpu and not _pallas_broken), dtype, sdtype


def _default_window(cfg):
    """Resolve the fold window PER KNOB: a user-set value always wins; the
    TPU-tuned module default applies only on TPU; otherwise the
    checkpoint's own CPU-tuned value (the folds-are-free-batch rationale
    only holds on the accelerator)."""
    on_tpu = jax.devices()[0].platform == "tpu"

    def pick(user_set, module_default, ckpt_value):
        if (user_set or on_tpu) and module_default is not None:
            return module_default
        return ckpt_value

    return (
        pick(_target_user_set, _default_target, cfg.gen_target),
        pick(_overlap_user_set, _default_overlap, cfg.gen_overlap),
    )


def load_model(weights_fpath, voc_type: str = base.VOC_TYPE_PYTORCH,
               verbose: bool = True, native_batch: int = 1):
    """Load vocoder weights; model type auto-detected from the checkpoint
    (ref: vocoder/inference.py:11-53). ``native_batch`` > 1 opts the C++
    backend into lockstep chunk batching — real-time on a single core at
    batch 4+ (BENCHMARKS.md round 4)."""
    global _model, _model_type, _cpp_model

    if voc_type == base.VOC_TYPE_PYTORCH:
        ckpt = load_checkpoint(weights_fpath)
        _model_type = ckpt.get("model_type") or base.MODEL_TYPE_FATCHORD
        override_hp = base.config_from_extras(_model_type, ckpt.get("extras"))
        bundle = base.init_voc_model(_model_type, override_hp=override_hp)
        if ckpt.get("torch_state") is not None:
            variables = import_torch_state(ckpt["torch_state"], bundle.dims)
        else:
            variables = {
                "params": ckpt["params"],
                "batch_stats": ckpt["extras"].get(
                    "batch_stats", bundle.variables["batch_stats"]
                ),
            }
        _model = bundle._replace(variables=variables)
        if verbose:
            print(
                "Loaded vocoder of model '%s' at path '%s'." % (_model_type, weights_fpath)
            )
            print("Model has been trained to step %d." % ckpt["step"])
    elif voc_type == base.VOC_TYPE_CPP:
        from rtvc_tpu.native import libwavernn

        _cpp_model = libwavernn.Vocoder(weights_fpath, "runtimeracer-wavernn",
                                        verbose, batch=native_batch)
        _cpp_model.load()
        _model_type = voc_type
        if verbose:
            print(
                "Loaded vocoder of model '%s' at path '%s'." % (_model_type, weights_fpath)
            )
    else:
        raise NotImplementedError(
            "Invalid vocoder of type '%s' provided. Aborting..." % voc_type
        )


def load_bundle(bundle: base.VocModel):
    """Directly install an in-memory vocoder bundle (self-tests, benches)."""
    global _model, _model_type
    _model = bundle
    _model_type = bundle.model_type


def is_loaded() -> bool:
    return _model is not None or _cpp_model is not None


def warmup(frame_buckets=(64, 128, 192, 256, 320, 384, 448, 512)) -> int:
    """Precompile the generate graph for the given mel frame-count buckets
    (serving cold-start killer: the first call per bucket otherwise pays
    the full XLA compile — ~20-40 s on TPU, up to minutes through a remote
    runtime). Returns the number of graphs compiled. The persistent
    compilation cache makes repeated process starts nearly free."""
    if _model is None:
        raise Exception("Please load Wave-RNN in memory before using it")
    from rtvc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    d = _model.dims
    n = 0
    for frames in frame_buckets:
        mel = np.zeros((d.feat_dims, int(frames)), np.float32)
        infer_waveform(mel, normalize=False)
        n += 1
    return n


def infer_waveform(
    mel: np.ndarray,
    normalize: bool = True,
    batched: bool = True,
    target: Optional[int] = None,
    overlap: Optional[int] = None,
    progress_callback=None,
) -> np.ndarray:
    """Mel (synthesizer format, (80, T)) → waveform
    (ref: vocoder/inference.py:59-95)."""
    global _gen_counter
    if _model is None and _cpp_model is None:
        raise Exception("Please load Wave-RNN in memory before using it")

    if _model_type == base.VOC_TYPE_CPP:
        return _cpp_model.vocode_mel(
            mel=mel, normalize=normalize, progress_callback=progress_callback
        )

    cfg = _model.config
    default_t, default_o = _default_window(cfg)
    if target is None:
        target = default_t
    if overlap is None:
        overlap = default_o

    sp = _sig.sp
    if normalize:
        mel = mel / sp.max_abs_value

    _gen_counter += 1
    key = jax.random.fold_in(jax.random.PRNGKey(_seed), _gen_counter)
    use_pallas, dtype, sdtype = _gen_backend()
    kwargs = dict(
        batched=batched, target=target, overlap=overlap, mu_law=cfg.mu_law,
        apply_preemphasis=sp.preemphasize, compute_dtype=dtype,
        stream_dtype=sdtype,
    )
    try:
        wav = wavernn_generate(
            _model.variables, _model.dims,
            np.asarray(mel, dtype=np.float32), key,
            use_pallas=use_pallas, **kwargs,
        )
    except Exception:
        if not use_pallas:
            raise
        # Could be a Pallas-backend failure (e.g. "Only interpret mode is
        # supported on CPU backend", a ValueError) OR the caller's bad
        # input. Retry on the XLA path: a genuine input error raises again
        # there (surfaced to the caller, backend not degraded); a backend
        # failure succeeds and stickily disables Pallas.
        logger.exception(
            "Pallas WaveRNN generation failed; retrying on the XLA scan path."
        )
        wav = wavernn_generate(
            _model.variables, _model.dims,
            np.asarray(mel, dtype=np.float32), key,
            use_pallas=False, **kwargs,
        )
        global _pallas_broken
        _pallas_broken = True
        logger.warning(
            "XLA path succeeded — disabling the Pallas backend for later "
            "calls (reset with set_generation_options())."
        )
    if progress_callback is not None:
        progress_callback(len(wav), len(wav), 1, 0.0)
    return wav


def infer_waveforms(
    mels,
    normalize: bool = True,
    target: Optional[int] = None,
    overlap: Optional[int] = None,
):
    """Vocode several mels in ONE fused batch (every utterance's fold windows
    share the device batch axis). Returns a list of waveforms."""
    global _gen_counter
    if _model is None:
        raise Exception("Please load Wave-RNN in memory before using it")
    from rtvc_tpu.models.wavernn import wavernn_generate_batch

    cfg = _model.config
    default_t, default_o = _default_window(cfg)
    if target is None:
        target = default_t
    if overlap is None:
        overlap = default_o
    sp = _sig.sp
    if normalize:
        mels = [m / sp.max_abs_value for m in mels]
    _gen_counter += 1
    key = jax.random.fold_in(jax.random.PRNGKey(_seed), _gen_counter)
    use_pallas, dtype, sdtype = _gen_backend()
    kwargs = dict(target=target, overlap=overlap, mu_law=cfg.mu_law,
                  apply_preemphasis=sp.preemphasize, compute_dtype=dtype,
                  stream_dtype=sdtype)
    try:
        return wavernn_generate_batch(
            _model.variables, _model.dims, mels, key,
            use_pallas=use_pallas, **kwargs,
        )
    except Exception:
        if not use_pallas:
            raise
        global _pallas_broken
        _pallas_broken = True
        return wavernn_generate_batch(
            _model.variables, _model.dims, mels, key,
            use_pallas=False, **kwargs,
        )


def set_seed(seed: int) -> None:
    """Deterministic generation: same seed → same audio
    (ref: vocoder/inference.py:97-101)."""
    global _seed, _gen_counter
    _seed = int(seed)
    _gen_counter = 0
    if _model_type == base.VOC_TYPE_CPP and _cpp_model is not None:
        _cpp_model.setRandomSeed(seed)
