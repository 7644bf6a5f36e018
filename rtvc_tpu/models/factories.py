"""Model factories with the reference's model-type string contract.

Synthesizers (ref: synthesizer/models/base.py:9-71): ``tacotron``,
``forward-tacotron`` — plus ``fast-pitch``, which the reference ships but
never registers (ref gap: synthesizer/models/base.py:9-10,
config/hparams.py:215-217); here it is a first-class citizen.
Vocoders (ref: vocoder/models/base.py:9-121): ``fatchord-wavernn``,
``geneing-wavernn``, ``runtimeracer-wavernn``.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax

from rtvc_tpu.config import signal as _sig
from rtvc_tpu.config import synthesizer as _syn_cfg
from rtvc_tpu.config import vocoder as _voc_cfg
from rtvc_tpu.config.vocoder import WaveRNNParams
from rtvc_tpu.text.symbols import symbols

# Vocoder backends (ref: vocoder/models/base.py:9-10)
VOC_TYPE_CPP = "libwavernn"
VOC_TYPE_PYTORCH = "pytorch"  # name kept for API compat; here it's the JAX path
VOC_TYPE_JAX = VOC_TYPE_PYTORCH

# Model types
MODEL_TYPE_TACOTRON = "tacotron"
MODEL_TYPE_FORWARD_TACOTRON = "forward-tacotron"
MODEL_TYPE_FASTPITCH = "fast-pitch"
MODEL_TYPE_FATCHORD = "fatchord-wavernn"
MODEL_TYPE_GENEING = "geneing-wavernn"
MODEL_TYPE_RUNTIMERACER = "runtimeracer-wavernn"

SYN_MODEL_TYPES = (MODEL_TYPE_TACOTRON, MODEL_TYPE_FORWARD_TACOTRON, MODEL_TYPE_FASTPITCH)
VOC_MODEL_TYPES = (MODEL_TYPE_FATCHORD, MODEL_TYPE_GENEING, MODEL_TYPE_RUNTIMERACER)


class SynModel(NamedTuple):
    """A synthesizer bundle: type tag + static dims + variables tree."""

    model_type: str
    dims: Any
    variables: Dict[str, Any]
    config: Any


class VocModel(NamedTuple):
    """A vocoder bundle: type tag + static dims + variables tree + hparams."""

    model_type: str
    dims: Any
    variables: Dict[str, Any]
    config: WaveRNNParams


def init_syn_model(
    model_type: str,
    seed: int = 0,
    override_hp: Optional[Any] = None,
    variables: Optional[Dict[str, Any]] = None,
) -> SynModel:
    """Build a synthesizer (ref: synthesizer/models/base.py:13-71)."""
    sp = _sig.sp
    spk = _sig.sv2tts.speaker_embedding_size
    if model_type == MODEL_TYPE_TACOTRON:
        from rtvc_tpu.models.tacotron import TacotronDims, init_tacotron

        cfg = override_hp or _syn_cfg.tacotron
        dims = TacotronDims.from_config(
            cfg, num_chars=len(symbols), n_mels=sp.num_mels,
            fft_bins=sp.num_mels, spk=spk,
        )
        if variables is None:
            variables = init_tacotron(jax.random.PRNGKey(seed), dims)
        return SynModel(model_type, dims, variables, cfg)
    if model_type == MODEL_TYPE_FORWARD_TACOTRON:
        from rtvc_tpu.models.forward_tacotron import (
            ForwardTacotronDims,
            init_forward_tacotron,
        )

        cfg = override_hp or _syn_cfg.forward_tacotron
        dims = ForwardTacotronDims.from_config(
            cfg, num_chars=len(symbols), n_mels=sp.num_mels, spk=spk
        )
        if variables is None:
            variables = init_forward_tacotron(jax.random.PRNGKey(seed), dims)
        return SynModel(model_type, dims, variables, cfg)
    if model_type == MODEL_TYPE_FASTPITCH:
        from rtvc_tpu.models.fast_pitch import FastPitchDims, init_fast_pitch

        cfg = override_hp or _syn_cfg.fast_pitch
        dims = FastPitchDims.from_config(
            cfg, num_chars=len(symbols), n_mels=sp.num_mels, spk=spk
        )
        if variables is None:
            variables = init_fast_pitch(jax.random.PRNGKey(seed), dims)
        return SynModel(model_type, dims, variables, cfg)
    raise NotImplementedError(
        "Invalid model of type '%s' provided. Aborting..." % model_type
    )


def init_voc_model(
    model_type: str,
    seed: int = 0,
    override_hp: Optional[WaveRNNParams] = None,
    variables: Optional[Dict[str, Any]] = None,
) -> VocModel:
    """Build a WaveRNN vocoder (ref: vocoder/models/base.py:18-109)."""
    from rtvc_tpu.models.wavernn import WaveRNNDims, init_wavernn

    sp = _sig.sp
    defaults = {
        MODEL_TYPE_FATCHORD: _voc_cfg.wavernn_fatchord,
        MODEL_TYPE_GENEING: _voc_cfg.wavernn_geneing,
        MODEL_TYPE_RUNTIMERACER: _voc_cfg.wavernn_runtimeracer,
    }
    if model_type not in defaults:
        raise NotImplementedError(
            "Invalid model of type '%s' provided. Aborting..." % model_type
        )
    cfg = override_hp or defaults[model_type]
    dims = WaveRNNDims.from_config(
        model_type, cfg, feat_dims=sp.num_mels, hop=sp.hop_size, sr=sp.sample_rate
    )
    if variables is None:
        variables = init_wavernn(jax.random.PRNGKey(seed), dims)
    return VocModel(model_type, dims, variables, cfg)


def config_from_extras(model_type: str, extras: Optional[Dict[str, Any]]):
    """Rebuild the hyper-parameter dataclass stored in a checkpoint's
    ``extras['config']`` (None when absent — defaults apply)."""
    cfg_dict = (extras or {}).get("config")
    if not cfg_dict:
        return None
    classes = {
        MODEL_TYPE_TACOTRON: _syn_cfg.TacotronParams,
        MODEL_TYPE_FORWARD_TACOTRON: _syn_cfg.ForwardTacotronParams,
        MODEL_TYPE_FASTPITCH: _syn_cfg.FastPitchParams,
        MODEL_TYPE_FATCHORD: WaveRNNParams,
        MODEL_TYPE_GENEING: WaveRNNParams,
        MODEL_TYPE_RUNTIMERACER: WaveRNNParams,
    }

    def detuple(v):
        return tuple(detuple(x) for x in v) if isinstance(v, list) else v

    return classes[model_type](**{k: detuple(v) for k, v in cfg_dict.items()})


def get_model_train_elements(model_type: str) -> list:
    """Dataset elements each synthesizer needs
    (ref: synthesizer/models/base.py:74-82)."""
    if model_type == MODEL_TYPE_TACOTRON:
        return ["mel", "embed"]
    if model_type in (MODEL_TYPE_FORWARD_TACOTRON, MODEL_TYPE_FASTPITCH):
        return [
            "mel",
            "embed",
            "duration",
            "attention",
            "alignment",
            "phoneme_pitch",
            "phoneme_energy",
        ]
    raise NotImplementedError(
        "Invalid model of type '%s' provided. Aborting..." % model_type
    )
