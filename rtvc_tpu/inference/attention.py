"""Teacher-forced Tacotron attention extraction for the alignment pass.

Equivalent of the reference's batched attention helper (ref:
synthesizer/batched.py:11-41 + synthesizer/preprocess.py:325-370): run the
trained Tacotron teacher-forced at r=1 over (text, mel, embed) and return the
per-frame attention matrix used for duration extraction.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.config import preprocessing, sp
from rtvc_tpu.models import factories


class TacotronAligner:
    def __init__(self, model_fpath: Optional[Path] = None,
                 bundle: Optional[factories.SynModel] = None):
        if bundle is not None:
            self.bundle = bundle
        else:
            from rtvc_tpu.train.checkpoints import load_checkpoint

            ckpt = load_checkpoint(model_fpath)
            if ckpt.get("torch_state") is not None:
                from rtvc_tpu.models.tacotron import import_torch_state

                base = factories.init_syn_model(factories.MODEL_TYPE_TACOTRON)
                variables = import_torch_state(ckpt["torch_state"], base.dims)
                self.bundle = base._replace(variables=variables)
            else:
                self.bundle = factories.init_syn_model(
                    factories.MODEL_TYPE_TACOTRON, variables=ckpt["params"]
                )
        self._jit_cache = {}

    def _forward(self, text_len: int, mel_len: int):
        key = (text_len, mel_len)
        if key not in self._jit_cache:
            d = self.bundle.dims

            @jax.jit
            def fn(variables, chars, mels, embed):
                from rtvc_tpu.models.tacotron import tacotron_forward

                _, _, attn, _, _ = tacotron_forward(
                    variables, d, chars, mels, embed, r=1,
                    rng=jax.random.PRNGKey(0), train=False,
                )
                return attn

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def attention(
        self, tokens: np.ndarray, mel: np.ndarray, embed: np.ndarray
    ) -> np.ndarray:
        """tokens (T_text,), mel (n_mels, T_mel), embed (E,) →
        attention (T_mel, T_text)."""
        mel_len = mel.shape[-1]
        # pad one extra frame with the silence value like the reference
        # (ref: synthesizer/preprocess.py:349-353), bucket to 32 frames
        pad_value = -sp.max_abs_value if preprocessing.symmetric_mels else 0.0
        padded_len = -(-(mel_len + 1) // 32) * 32
        mel_p = np.full((mel.shape[0], padded_len), pad_value, np.float32)
        mel_p[:, :mel_len] = mel
        text_bucket = -(-len(tokens) // 16) * 16
        tok_p = np.zeros(text_bucket, np.int32)
        tok_p[: len(tokens)] = tokens

        fn = self._forward(text_bucket, padded_len)
        attn = fn(
            self.bundle.variables,
            jnp.asarray(tok_p[None]),
            jnp.asarray(mel_p[None]),
            jnp.asarray(embed[None]),
        )
        return np.asarray(attn)[0, :mel_len, : len(tokens)]
