"""Synthesizer inference — public API surface (ref: synthesizer/inference.py).

``Synthesizer`` class (lazy load, model type auto-detected from checkpoint)
plus module-level ``load_model`` / ``synthesize_spectrograms`` /
``load_preprocess_wav`` / ``make_spectrogram`` / ``griffin_lim``.

TPU notes: char sequences are padded to 32-multiples and generation buffers
have a static 2000-step cap, so repeated calls share a handful of compiled
shapes. The postnet runs on frame buckets padded with the silence mel value
(the same padding training uses).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.config import preprocessing, sp
from rtvc_tpu.config import synthesizer as _syn_cfg
from rtvc_tpu.models import factories as base
from rtvc_tpu.ops import audio as audio_ops
from rtvc_tpu.text import text_to_sequence
from rtvc_tpu.train.checkpoints import load_checkpoint
from rtvc_tpu.utils.io import load_wav

logger = logging.getLogger(__name__)

_CHAR_BUCKET = 32

# Decoder backend: None = auto (fused Pallas kernel on TPU, XLA elsewhere);
# True/False forces. Any Pallas failure falls back to XLA and is remembered.
_USE_PALLAS_DECODER: Optional[bool] = None
_pallas_decoder_broken = False


def set_decoder_backend(use_pallas: Optional[bool] = None) -> None:
    """Force (True/False) or restore auto (None) decoder backend selection."""
    global _USE_PALLAS_DECODER, _pallas_decoder_broken
    _USE_PALLAS_DECODER = use_pallas
    _pallas_decoder_broken = False


def _decoder_backend() -> bool:
    if _pallas_decoder_broken:
        return False
    if _USE_PALLAS_DECODER is not None:
        return _USE_PALLAS_DECODER
    return jax.devices()[0].platform == "tpu"


def pad1d(x, max_len, pad_value=0):
    return np.pad(x, (0, max_len - len(x)), mode="constant", constant_values=pad_value)


class Synthesizer:
    """Lazy-loading synthesizer with the reference's surface
    (ref: synthesizer/inference.py:13-162)."""

    sample_rate = sp.sample_rate
    hparams = sp

    def __init__(self, model_fpath: Union[str, Path], verbose: bool = True):
        self.model_fpath = Path(model_fpath)
        self.verbose = verbose
        self._model: Optional[base.SynModel] = None
        self._model_type: Optional[str] = None
        self._step = 0
        self._r = 2
        self._generate_fn = None

    def is_loaded(self) -> bool:
        return self._model is not None

    def get_model_type(self) -> str:
        if not self.is_loaded():
            self.load()
        return self._model_type

    def load(self):
        ckpt = load_checkpoint(self.model_fpath)
        self._model_type = ckpt.get("model_type") or base.MODEL_TYPE_TACOTRON
        self._step = ckpt["step"]
        if ckpt.get("torch_state") is not None:
            bundle = base.init_syn_model(self._model_type)
            if self._model_type == base.MODEL_TYPE_TACOTRON:
                from rtvc_tpu.models.tacotron import import_torch_state

                variables = import_torch_state(ckpt["torch_state"], bundle.dims)
            elif self._model_type == base.MODEL_TYPE_FORWARD_TACOTRON:
                from rtvc_tpu.models.forward_tacotron import import_torch_state

                variables = import_torch_state(ckpt["torch_state"], bundle.dims)
            else:
                raise NotImplementedError(
                    "No torch importer for model type %s" % self._model_type
                )
            self._model = bundle._replace(variables=variables)
            # reference stores r inside the decoder as a buffer
            if "decoder.r" in ckpt["torch_state"]:
                self._r = int(np.asarray(ckpt["torch_state"]["decoder.r"]))
        else:
            override_hp = base.config_from_extras(
                self._model_type, ckpt.get("extras")
            )
            self._model = base.init_syn_model(
                self._model_type,
                override_hp=override_hp,
                variables={
                    "params": ckpt["params"],
                    "batch_stats": ckpt["extras"].get("batch_stats", {}),
                },
            )
            self._r = int(ckpt["extras"].get("r", 2))
        if self.verbose:
            print(
                "Loaded synthesizer of model '%s' at path '%s'."
                % (self._model_type, self.model_fpath.name)
            )
            print("Model has been trained to step %d." % self._step)

    def load_bundle(self, bundle: base.SynModel, r: int = 2):
        """Install an in-memory model (self-tests, benches)."""
        self._model = bundle
        self._model_type = bundle.model_type
        self._r = r

    # -- generation ---------------------------------------------------------

    def synthesize_spectrograms(
        self,
        texts: List[str],
        embeddings: Union[np.ndarray, List[np.ndarray]],
        return_alignments: bool = False,
        speed_modifier: float = 1.0,
        pitch_function: Optional[Callable] = None,
        energy_function: Optional[Callable] = None,
        seed: int = 0,
    ):
        """texts + speaker embeddings → list of (80, Mi) mels
        (ref: synthesizer/inference.py:79-162)."""
        if not self.is_loaded():
            self.load()

        inputs = [
            text_to_sequence(text.strip(), preprocessing.cleaner_names)
            for text in texts
        ]
        if not isinstance(embeddings, list):
            embeddings = [embeddings] if np.ndim(embeddings) == 1 else list(embeddings)

        bs = preprocessing.synthesis_batch_size
        batched_inputs = [inputs[i : i + bs] for i in range(0, len(inputs), bs)]
        batched_embeds = [embeddings[i : i + bs] for i in range(0, len(embeddings), bs)]

        specs, alignments = [], []
        for i, batch in enumerate(batched_inputs, 1):
            if self.verbose:
                print(f"\n| Generating {i}/{len(batched_inputs)}")
            text_lens = [len(t) for t in batch]
            max_text_len = max(text_lens)
            bucket_len = -(-max_text_len // _CHAR_BUCKET) * _CHAR_BUCKET
            chars = np.stack([pad1d(t, bucket_len) for t in batch]).astype(np.int32)
            speaker_embeds = np.stack(batched_embeds[i - 1]).astype(np.float32)

            if self._model_type == base.MODEL_TYPE_TACOTRON:
                mels, aligns = self._generate_tacotron(chars, speaker_embeds, seed)
            else:
                mels, aligns = self._generate_forward(
                    chars, speaker_embeds, speed_modifier,
                    pitch_function, energy_function, seed,
                )
            specs.extend(mels)
            alignments.extend(aligns)

        if self.verbose:
            print("\n\nDone.\n")
        return (specs, alignments) if return_alignments else specs

    def _decode_fn(self, d, r, max_steps):
        """Per-(dims, r, max_steps) cached decoder — a fresh jit per call
        would retrace every request. On TPU the fused Pallas decoder kernel
        is used (~1.7× the XLA while_loop); any Pallas failure falls back
        to XLA once and is remembered."""
        from rtvc_tpu.models import tacotron as taco

        key = (d, r, max_steps, _decoder_backend())
        cache = getattr(self, "_decode_cache", None)
        if cache is not None and cache[0] == key:
            return cache[1]

        @jax.jit
        def _decode_xla(variables, chars, embeds, rng):
            return taco.tacotron_generate(
                variables, d, chars, embeds, r, rng, max_steps=max_steps,
                compute_linear=False,
            )

        if not _decoder_backend():
            self._decode_cache = (key, _decode_xla)
            return _decode_xla

        from rtvc_tpu.ops.pallas import tacotron_kernel as tkern

        @jax.jit
        def _encode(variables, chars, embeds, rng):
            enc_seq, enc_proj, _ = taco.encode(
                variables, d, chars, embeds, train=False, rng=rng
            )
            return enc_seq, enc_proj

        def _decode(variables, chars, embeds, rng):
            global _pallas_decoder_broken
            try:
                k_enc, k_dec = jax.random.split(rng)
                enc_seq, enc_proj = _encode(variables, chars, embeds, k_enc)
                mask = (chars != 0).astype(jnp.float32)
                mel, attn, stops = tkern.decode_pallas(
                    variables, d, enc_seq, enc_proj, mask, k_dec,
                    r=r, max_steps=max_steps,
                )
                stops = np.asarray(stops)
                it = np.arange(stops.shape[1])
                fired = np.all(stops > 0.5, axis=0) & (it * r > 10)
                n_iters = (int(np.argmax(fired)) + 1 if fired.any()
                           else stops.shape[1])
                return mel, None, attn, n_iters * r
            except Exception:
                # Could be a Pallas-backend failure (e.g. unsupported on
                # this platform — a ValueError) OR the caller's bad input.
                # Retry on the XLA path: a genuine input error raises again
                # there; a backend failure succeeds and stickily disables
                # the Pallas decoder.
                logger.exception(
                    "Pallas Tacotron decoder failed; retrying on the XLA "
                    "while_loop path."
                )
                out = _decode_xla(variables, chars, embeds, rng)
                _pallas_decoder_broken = True
                logger.warning(
                    "XLA path succeeded — disabling the Pallas decoder for "
                    "later calls (reset with set_decoder_backend())."
                )
                return out

        self._decode_cache = (key, _decode)
        return _decode

    def _generate_tacotron(self, chars, speaker_embeds, seed):
        d, variables = self._model.dims, self._model.variables
        r = self._r
        max_steps = (self._model.config.max_decoder_steps // r) * r
        _decode = self._decode_fn(d, r, max_steps)

        mel_buf, _, attn, n = _decode(
            variables, jnp.asarray(chars), jnp.asarray(speaker_embeds),
            jax.random.PRNGKey(seed),
        )
        n = max(int(n), r)

        # Postnet on a frame bucket padded with the silence mel value (same
        # padding as training collate, ref: synthesizer_dataset.py:126-143).
        bucket = -(-n // 128) * 128
        mel_trim = np.full(
            (mel_buf.shape[0], d.n_mels, bucket), -sp.max_abs_value, np.float32
        )
        mel_trim[:, :, :n] = np.asarray(mel_buf)[:, :, :n]
        linear = np.asarray(self._postnet_jit(variables, jnp.asarray(mel_trim)))

        # The reference returns the POSTNET output as the final mel
        # (ref: synthesizer/inference.py:141 — `_, mels, alignments`).
        mels, aligns = [], []
        attn_np = np.asarray(attn)[:, : n // r, :]
        for b in range(linear.shape[0]):
            m = linear[b, :, :n]
            # Trim trailing frames below the stop threshold
            # (ref: synthesizer/inference.py:149-152).
            end = m.shape[1]
            while end > 1 and np.max(m[:, end - 1]) < self._model.config.stop_threshold:
                end -= 1
            mels.append(m[:, :end].astype(np.float32))
            aligns.append(attn_np[b])
        return mels, aligns

    @property
    def _postnet_jit(self):
        from rtvc_tpu.models import tacotron as taco

        d = self._model.dims
        cached = getattr(self, "_postnet_cache", None)
        if cached is not None and cached[0] == d:
            return cached[1]

        @jax.jit
        def _run(variables, mel):
            linear, _ = taco._postnet(variables, d, mel, False, None)
            return jnp.swapaxes(linear, 1, 2)

        self._postnet_cache = (d, _run)
        return _run

    def _generate_forward(
        self, chars, speaker_embeds, speed_modifier, pitch_function,
        energy_function, seed,
    ):
        d, variables = self._model.dims, self._model.variables
        if self._model_type == base.MODEL_TYPE_FASTPITCH:
            from rtvc_tpu.models.fast_pitch import fastpitch_generate as gen
        else:
            from rtvc_tpu.models.forward_tacotron import forward_generate as gen

        mels, durs = gen(
            variables, d, jnp.asarray(chars), jnp.asarray(speaker_embeds),
            jax.random.PRNGKey(seed), alpha=1.0 / speed_modifier,
            pitch_function=pitch_function, energy_function=energy_function,
        )
        out, aligns = [], []
        for b in range(mels.shape[0]):
            n = int(np.asarray(durs[b]).sum())
            out.append(np.asarray(mels[b])[:, : max(n, 1)].astype(np.float32))
            aligns.append(np.asarray(durs[b]))
        return out, aligns


# ---------------------------------------------------------------------------
# Module-level API (ref: synthesizer/inference.py:165-235)
# ---------------------------------------------------------------------------
# (class-level aliases are attached below the function definitions so code
# written against the reference's `Synthesizer.make_spectrogram(...)` style
# keeps working)

_model: Optional[Synthesizer] = None


def load_model(weights_fpath, verbose: bool = True):
    global _model
    _model = Synthesizer(weights_fpath, verbose)
    _model.load()


def is_loaded() -> bool:
    return _model is not None and _model.is_loaded()


def get_model_type() -> str:
    if not is_loaded():
        raise Exception("Please load Synthesizer in memory before using it")
    return _model.get_model_type()


def synthesize_spectrograms(
    texts: List[str],
    embeddings: Union[np.ndarray, List[np.ndarray]],
    return_alignments: bool = False,
    speed_modifier: float = 1.0,
    pitch_function=None,
    energy_function=None,
    seed: int = 0,
):
    if not is_loaded():
        raise Exception("Please load Synthesizer in memory before using it")
    return _model.synthesize_spectrograms(
        texts=texts,
        embeddings=embeddings,
        return_alignments=return_alignments,
        speed_modifier=speed_modifier,
        pitch_function=pitch_function,
        energy_function=energy_function,
        seed=seed,
    )


def load_preprocess_wav(fpath) -> np.ndarray:
    """Load + rescale like synthesizer training audio
    (ref: synthesizer/inference.py:205-213)."""
    wav, _ = load_wav(fpath, target_sr=sp.sample_rate)
    if preprocessing.rescale:
        wav = wav / np.abs(wav).max() * preprocessing.rescaling_max
    return wav


def make_spectrogram(fpath_or_wav: Union[str, Path, np.ndarray]) -> np.ndarray:
    """Waveform/file → training-format mel
    (ref: synthesizer/inference.py:216-225)."""
    if isinstance(fpath_or_wav, (str, Path)):
        wav = load_preprocess_wav(fpath_or_wav)
    else:
        wav = fpath_or_wav
    return np.asarray(
        audio_ops.melspectrogram(jnp.asarray(wav, jnp.float32), sp, preprocessing),
        dtype=np.float32,
    )


def griffin_lim(mel: np.ndarray, seed: int = 0) -> np.ndarray:
    """Invert a training-format mel with Griffin-Lim
    (ref: synthesizer/inference.py:228-233)."""
    return np.asarray(
        audio_ops.inv_mel_spectrogram(
            jnp.asarray(mel, jnp.float32), sp, preprocessing, jax.random.PRNGKey(seed)
        )
    )


# Reference code calls these as Synthesizer static helpers
# (ref usage: synthesizer/inference.py:216-219, toolbox).
Synthesizer.load_preprocess_wav = staticmethod(load_preprocess_wav)
Synthesizer.make_spectrogram = staticmethod(make_spectrogram)
Synthesizer.griffin_lim = staticmethod(griffin_lim)
