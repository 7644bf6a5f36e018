"""Tacotron behavior tests (generate loop semantics).

Full-model parity against the GENUINE reference implementation lives in
tests/ref_oracle/test_ref_tacotron.py (teacher-forced forward, generate,
early stop) — no torch replicas here.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.models.tacotron import (
    TacotronDims,
    init_tacotron,
    tacotron_generate,
)


def _dims():
    cfg = TacotronParams(
        embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
        encoder_K=2, lstm_dims=32, postnet_K=2, num_highways=2, dropout=0.0,
    )
    # fft_bins == n_mels, matching the reference factory
    # (ref: synthesizer/models/base.py:25-26)
    return cfg, TacotronDims.from_config(cfg, num_chars=20, n_mels=6,
                                         fft_bins=6, spk=8)


class TestGenerate:
    @pytest.mark.slow  # compiles the full while_loop generate (~30 s)
    def test_shapes_and_valid_steps(self):
        cfg, d = _dims()
        variables = init_tacotron(jax.random.PRNGKey(0), d)
        B, T_text, r, max_steps = 2, 10, 2, 40
        chars = jnp.asarray(
            np.random.default_rng(0).integers(1, d.num_chars, (B, T_text))
        )
        spk = jnp.asarray(np.random.default_rng(1).standard_normal((B, 8)), jnp.float32)
        mel, lin, attn, n = tacotron_generate(
            variables, d, chars, spk, r, jax.random.PRNGKey(1),
            max_steps=max_steps, compute_linear=True,
        )
        assert mel.shape == (B, d.n_mels, max_steps)
        assert lin.shape == (B, d.fft_bins, max_steps)
        assert attn.shape == (B, max_steps // r, T_text)
        n = int(n)
        assert 0 < n <= max_steps and n % r == 0

    def test_early_stop_when_stop_bias_high(self):
        """Force the stop head to fire immediately → loop must exit early."""
        cfg, d = _dims()
        variables = init_tacotron(jax.random.PRNGKey(0), d)
        variables["params"]["stop_proj"]["bias"] = jnp.asarray([100.0])
        chars = jnp.ones((1, 6), jnp.int32)
        spk = jnp.zeros((1, 8))
        _, _, _, n = tacotron_generate(
            variables, d, chars, spk, 2, jax.random.PRNGKey(1), max_steps=40
        )
        assert int(n) <= 14  # stops right after the t>10 guard

    def test_attention_rows_are_normalized(self):
        cfg, d = _dims()
        variables = init_tacotron(jax.random.PRNGKey(0), d)
        chars = jnp.asarray(
            np.random.default_rng(0).integers(1, d.num_chars, (1, 12))
        )
        spk = jnp.zeros((1, 8))
        mel, _, attn, n = tacotron_generate(
            variables, d, chars, spk, 2, jax.random.PRNGKey(1), max_steps=20
        )
        rows = np.asarray(attn)[0, : int(n) // 2]
        np.testing.assert_allclose(rows.sum(axis=-1), 1.0, atol=1e-5)
