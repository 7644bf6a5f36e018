"""FastPitch tests: torch-API MHA oracle, genuine-reference FFT block, full
model shapes/generate (full-model parity: tests/ref_oracle/test_ref_fast_pitch.py)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import FastPitchParams
from rtvc_tpu.models.fast_pitch import (
    FastPitchDims,
    fastpitch_forward,
    fastpitch_generate,
    fft_block,
    init_fast_pitch,
    multihead_attention,
    positional_encoding_table,
)


class TestMHA:
    def test_matches_torch_multihead(self):
        torch.manual_seed(0)
        E, H, B, T = 16, 4, 2, 7
        ref = torch.nn.MultiheadAttention(E, H, dropout=0.0)
        x = torch.randn(T, B, E)
        pad_mask = torch.zeros(B, T, dtype=torch.bool)
        pad_mask[1, 5:] = True
        with torch.no_grad():
            expected, _ = ref(x, x, x, key_padding_mask=pad_mask)
        sd = ref.state_dict()
        p = {
            "in_proj_weight": jnp.asarray(sd["in_proj_weight"].numpy()),
            "in_proj_bias": jnp.asarray(sd["in_proj_bias"].numpy()),
            "out_proj": {
                "weight": jnp.asarray(sd["out_proj.weight"].numpy()),
                "bias": jnp.asarray(sd["out_proj.bias"].numpy()),
            },
        }
        ours = multihead_attention(
            p, jnp.asarray(x.numpy().transpose(1, 0, 2)), H,
            jnp.asarray(pad_mask.numpy()),
        )
        np.testing.assert_allclose(
            np.asarray(ours), expected.numpy().transpose(1, 0, 2), atol=1e-5
        )


class TestFFTBlock:
    def test_matches_genuine_reference_fft_block(self):
        """Parity vs the REAL reference FFTBlock (fast_pitch.py:55-93),
        eval mode."""
        from tests.ref_oracle import ref_module, state_numpy

        fp_mod = ref_module("synthesizer.models.fast_pitch")
        torch.manual_seed(1)
        E, H, K, F_, B, T = 8, 2, 3, 16, 2, 6
        ref = fp_mod.FFTBlock(
            d_model=E, nhead=H, conv1_kernel=K, conv2_kernel=K, d_fft=F_,
            dropout=0.0,
        ).eval()
        x = torch.randn(T, B, E)
        pad_mask = torch.zeros(B, T, dtype=torch.bool)
        pad_mask[0, 4:] = True
        with torch.no_grad():
            expected = ref(x, src_pad_mask=pad_mask).numpy()

        sd = state_numpy(ref)
        p = {
            "self_attn": {
                "in_proj_weight": jnp.asarray(sd["self_attn.in_proj_weight"]),
                "in_proj_bias": jnp.asarray(sd["self_attn.in_proj_bias"]),
                "out_proj": {
                    "weight": jnp.asarray(sd["self_attn.out_proj.weight"]),
                    "bias": jnp.asarray(sd["self_attn.out_proj.bias"]),
                },
            },
            "conv1": {
                "weight": jnp.asarray(sd["conv1.weight"]),
                "bias": jnp.asarray(sd["conv1.bias"]),
            },
            "conv2": {
                "weight": jnp.asarray(sd["conv2.weight"]),
                "bias": jnp.asarray(sd["conv2.bias"]),
            },
            "norm1": {
                "weight": jnp.asarray(sd["norm1.weight"]),
                "bias": jnp.asarray(sd["norm1.bias"]),
            },
            "norm2": {
                "weight": jnp.asarray(sd["norm2.weight"]),
                "bias": jnp.asarray(sd["norm2.bias"]),
            },
        }
        ours = fft_block(
            p, jnp.asarray(x.numpy().transpose(1, 0, 2)), H, K,
            jnp.asarray(pad_mask.numpy()), 0.0, None, False,
        )
        np.testing.assert_allclose(
            np.asarray(ours), expected.transpose(1, 0, 2), atol=1e-5
        )


def _dims():
    cfg = FastPitchParams(
        embed_dims=16, n_heads=2, conv_kernel=3, conv_dims=32,
        n_layers_enc=2, n_layers_dec=2,
        series_d_model=8, series_n_heads=1, series_layers=1, series_d_fft=16,
    )
    return cfg, FastPitchDims.from_config(cfg, num_chars=20, n_mels=6, spk=8)


class TestModel:
    def test_positional_encoding_matches_torch_formula(self):
        pe = positional_encoding_table(8, max_len=16)
        position = torch.arange(16).float().unsqueeze(1)
        div = torch.exp(torch.arange(0, 8, 2).float() * (-np.log(10000.0) / 8))
        expected = torch.zeros(16, 8)
        expected[:, 0::2] = torch.sin(position * div)
        expected[:, 1::2] = torch.cos(position * div)
        np.testing.assert_allclose(pe, expected.numpy(), atol=1e-6)

    @pytest.mark.slow  # full-model compile (~18 s)
    def test_training_forward_shapes(self):
        cfg, d = _dims()
        variables = init_fast_pitch(jax.random.PRNGKey(0), d)
        B, T_text, L = 2, 7, 12
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(1, d.num_chars, (B, T_text)))
        mel = jnp.asarray(rng.standard_normal((B, d.n_mels, L)), jnp.float32)
        dur = jnp.asarray(np.full((B, T_text), 2.0), jnp.float32)
        spk = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
        lens = jnp.asarray([12, 10])
        pitch = jnp.asarray(rng.standard_normal((B, T_text)), jnp.float32)
        energy = jnp.asarray(rng.standard_normal((B, T_text)), jnp.float32)
        m, post, dur_hat, pitch_hat, energy_hat, _ = fastpitch_forward(
            variables, d, x, mel, dur, spk, lens, pitch, energy,
            jax.random.PRNGKey(0), train=True,
        )
        assert m.shape == (B, d.n_mels, L)
        assert dur_hat.shape == (B, T_text)
        assert pitch_hat.shape == (B, 1, T_text)
        assert np.isfinite(np.asarray(m)).all()

    def test_generate_and_speaker_conditioning(self):
        cfg, d = _dims()
        variables = init_fast_pitch(jax.random.PRNGKey(0), d)
        x = jnp.asarray(np.random.default_rng(0).integers(1, d.num_chars, (1, 6)))
        s1 = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8)), jnp.float32)
        s2 = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8)), jnp.float32)
        m1, durs = fastpitch_generate(variables, d, x, s1, jax.random.PRNGKey(0))
        m2, _ = fastpitch_generate(variables, d, x, s2, jax.random.PRNGKey(0))
        assert m1.shape[1] == d.n_mels
        assert (durs >= 0).all()
        # different speakers → different mels (speaker conditioning active)
        if m1.shape == m2.shape:
            assert not np.allclose(m1, m2)

    def test_registered_in_factory(self):
        from rtvc_tpu.models import factories

        cfg, _ = _dims()
        bundle = factories.init_syn_model(
            factories.MODEL_TYPE_FASTPITCH, override_hp=cfg
        )
        assert bundle.model_type == "fast-pitch"
        assert "dur_pred" in bundle.variables["params"]
