"""Parity vs the GENUINE reference FastPitch
(/root/reference/synthesizer/models/fast_pitch.py).

The reference FastPitch is present-but-unwired and has NO speaker
conditioning; our build wires it into the factory and adds SV2TTS speaker
projections. With zeroed speaker projections and a zero speaker embedding
our model must compute exactly the reference function (dropout 0)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import FastPitchParams
from rtvc_tpu.models.fast_pitch import (
    FastPitchDims,
    fastpitch_forward,
    fastpitch_generate,
    import_torch_state,
)
from tests.ref_oracle import ref_module, state_numpy


def _make_pair(seed=0):
    fp_mod = ref_module("synthesizer.models.fast_pitch")
    cfg = FastPitchParams(
        embed_dims=16, n_heads=2, conv_kernel=3, conv_dims=32,
        n_layers_enc=2, n_layers_dec=2,
        series_d_model=8, series_n_heads=1, series_layers=1, series_d_fft=16,
        dropout=0.0, series_dropout=0.0,
    )
    d = FastPitchDims.from_config(cfg, num_chars=20, n_mels=6, spk=8)
    torch.manual_seed(seed)
    ref = fp_mod.FastPitch(
        num_chars=d.num_chars,
        durpred_dropout=0.0, durpred_d_model=d.series_d_model,
        durpred_n_heads=d.series_n_heads, durpred_layers=d.series_layers,
        durpred_d_fft=d.series_d_fft,
        pitch_dropout=0.0, pitch_d_model=d.series_d_model,
        pitch_n_heads=d.series_n_heads, pitch_layers=d.series_layers,
        pitch_d_fft=d.series_d_fft,
        energy_dropout=0.0, energy_d_model=d.series_d_model,
        energy_n_heads=d.series_n_heads, energy_layers=d.series_layers,
        energy_d_fft=d.series_d_fft,
        pitch_strength=d.pitch_strength, energy_strength=d.energy_strength,
        d_model=d.d_model, conv1_kernel=d.conv_kernel,
        conv2_kernel=d.conv_kernel,
        prenet_layers=d.n_layers_enc, prenet_heads=d.n_heads,
        prenet_fft=d.d_fft, prenet_dropout=0.0,
        postnet_layers=d.n_layers_dec, postnet_heads=d.n_heads,
        postnet_fft=d.d_fft, postnet_dropout=0.0,
        n_mels=d.n_mels,
    ).eval()
    return ref, d


class TestReferenceFastPitchParity:
    def test_training_forward_matches_reference(self):
        ref, d = _make_pair()
        B, T_text = 2, 7
        g = torch.Generator().manual_seed(1)
        x = torch.randint(1, d.num_chars, (B, T_text), generator=g)
        dur = torch.tensor(
            [[2, 1, 3, 1, 2, 1, 2], [2, 2, 1, 1, 1, 0, 0]]
        ).float()
        mel_lens = dur.sum(dim=1).long()
        L = int(mel_lens.max())
        mel = torch.randn(B, d.n_mels, L, generator=g)
        pitch = torch.randn(B, T_text, generator=g)
        energy = torch.randn(B, T_text, generator=g)
        with torch.no_grad():
            out = ref(
                {
                    "x": x, "mel": mel, "dur": dur, "mel_len": mel_lens,
                    "pitch": pitch, "energy": energy,
                }
            )

        variables = import_torch_state(state_numpy(ref), d)
        spk = jnp.zeros((B, d.speaker_embedding_size))
        mel_hat, post_hat, dur_hat, pitch_hat, energy_hat, _ = fastpitch_forward(
            variables, d,
            jnp.asarray(x.numpy()), jnp.asarray(mel.numpy()),
            jnp.asarray(dur.numpy()), spk,
            jnp.asarray(mel_lens.numpy()), jnp.asarray(pitch.numpy()),
            jnp.asarray(energy.numpy()),
            jax.random.PRNGKey(0), train=False,
        )
        np.testing.assert_allclose(
            np.asarray(dur_hat), out["dur"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(pitch_hat), out["pitch"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(energy_hat), out["energy"].numpy(), atol=1e-4
        )
        # mel: the reference computes real values in other elements' pad
        # region (it does not fill with padding_value; we do) — compare the
        # valid frames of each element.
        ours = np.asarray(post_hat)
        exp = out["mel_post"].numpy()
        for b in range(B):
            n = int(mel_lens[b])
            np.testing.assert_allclose(
                ours[b, :, :n], exp[b, :, :n], atol=1e-3
            )

    def test_generate_matches_reference(self):
        """Inference path with predicted durations (ref fast_pitch.py:289-340);
        our bucketed synthesis must match the reference's unpadded run on the
        valid frames."""
        ref, d = _make_pair(seed=2)
        B, T_text = 1, 6
        g = torch.Generator().manual_seed(3)
        x = torch.randint(1, d.num_chars, (B, T_text), generator=g)
        with torch.no_grad():
            out = ref.generate(x)
        e_mel = out["mel_post"].numpy()

        variables = import_torch_state(state_numpy(ref), d)
        mel, durs = fastpitch_generate(
            variables, d, jnp.asarray(x.numpy()),
            jnp.zeros((B, d.speaker_embedding_size)), jax.random.PRNGKey(0),
        )
        m = np.asarray(mel)[..., : e_mel.shape[-1]]
        assert m.shape == e_mel.shape, (m.shape, e_mel.shape)
        np.testing.assert_allclose(m, e_mel, atol=1e-3)
