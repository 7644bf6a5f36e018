"""Parity vs the GENUINE reference ForwardTacotron
(/root/reference/synthesizer/models/forward_tacotron.py) — training forward
(mel/postnet/duration/pitch/energy heads) and generate with identical
weights. Dropout is 0 everywhere for determinism."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import ForwardTacotronParams
from rtvc_tpu.models.forward_tacotron import (
    ForwardTacotronDims,
    forward_generate,
    forward_tacotron_forward,
    import_torch_state,
)
from tests.ref_oracle import ref_module, state_numpy


def _make_pair(seed=0):
    ft_mod = ref_module("synthesizer.models.forward_tacotron")
    cfg = ForwardTacotronParams(
        embed_dims=16, series_embed_dims=8,
        duration_conv_dims=12, duration_rnn_dims=8,
        pitch_conv_dims=12, pitch_rnn_dims=8,
        energy_conv_dims=12, energy_rnn_dims=8,
        prenet_dims=16, prenet_k=3, prenet_num_highways=2,
        rnn_dims=16, postnet_dims=12, postnet_k=3, postnet_num_highways=2,
        prenet_dropout=0.0, postnet_dropout=0.0,
        duration_dropout=0.0, pitch_dropout=0.0, energy_dropout=0.0,
    )
    d = ForwardTacotronDims.from_config(cfg, num_chars=20, n_mels=6, spk=8)
    torch.manual_seed(seed)
    ref = ft_mod.ForwardTacotron(
        embed_dims=d.embed_dims,
        series_embed_dims=d.series_embed_dims,
        num_chars=d.num_chars,
        durpred_conv_dims=d.duration_conv_dims,
        durpred_rnn_dims=d.duration_rnn_dims,
        durpred_dropout=0.0,
        pitch_conv_dims=d.pitch_conv_dims,
        pitch_rnn_dims=d.pitch_rnn_dims,
        pitch_dropout=0.0,
        pitch_strength=d.pitch_strength,
        energy_conv_dims=d.energy_conv_dims,
        energy_rnn_dims=d.energy_rnn_dims,
        energy_dropout=0.0,
        energy_strength=d.energy_strength,
        rnn_dims=d.rnn_dims,
        prenet_dims=d.prenet_dims,
        prenet_k=d.prenet_k,
        postnet_num_highways=d.postnet_num_highways,
        prenet_dropout=0.0,
        postnet_dims=d.postnet_dims,
        postnet_k=d.postnet_k,
        prenet_num_highways=d.prenet_num_highways,
        postnet_dropout=0.0,
        n_mels=d.n_mels,
        speaker_embed_dims=d.speaker_embedding_size,
    ).eval()
    return ref, d


class TestReferenceForwardTacotronParity:
    def test_training_forward_matches_reference(self):
        ref, d = _make_pair()
        B, T_text = 2, 7
        g = torch.Generator().manual_seed(1)
        x = torch.randint(1, d.num_chars, (B, T_text), generator=g)
        dur = torch.tensor(
            [[2, 1, 3, 1, 2, 1, 2], [1, 2, 1, 1, 1, 0, 0]]
        ).float()
        mel_lens = dur.sum(dim=1).long()
        L = int(mel_lens.max())
        mel = torch.randn(B, d.n_mels, L, generator=g)
        spk = torch.randn(B, d.speaker_embedding_size, generator=g)
        pitch = torch.randn(B, T_text, generator=g)
        energy = torch.randn(B, T_text, generator=g)
        with torch.no_grad():
            e_mel, e_post, e_dur, e_pitch, e_energy = ref(
                x, mel, dur, spk, mel_lens, pitch, energy
            )

        variables = import_torch_state(state_numpy(ref), d)
        mel_hat, post_hat, dur_hat, pitch_hat, energy_hat, _ = (
            forward_tacotron_forward(
                variables, d,
                jnp.asarray(x.numpy()), jnp.asarray(mel.numpy()),
                jnp.asarray(dur.numpy()), jnp.asarray(spk.numpy()),
                jnp.asarray(mel_lens.numpy()), jnp.asarray(pitch.numpy()),
                jnp.asarray(energy.numpy()),
                jax.random.PRNGKey(0), train=False,
            )
        )
        np.testing.assert_allclose(np.asarray(dur_hat), e_dur.numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(pitch_hat), e_pitch.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(energy_hat), e_energy.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(mel_hat), e_mel.numpy(), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(post_hat), e_post.numpy(), atol=1e-3
        )

    def test_generate_matches_reference(self):
        """Inference path (predicted durations/pitch/energy) vs the reference
        generate (ref forward_tacotron.py:185-260)."""
        ref, d = _make_pair(seed=4)
        B, T_text = 1, 6
        g = torch.Generator().manual_seed(5)
        x = torch.randint(1, d.num_chars, (B, T_text), generator=g)
        spk = torch.randn(B, d.speaker_embedding_size, generator=g)
        with torch.no_grad():
            out = ref.generate(x, spk)
        e_mel = out["mel_post"] if isinstance(out, dict) else out[1]

        variables = import_torch_state(state_numpy(ref), d)
        mel, durs = forward_generate(
            variables, d, jnp.asarray(x.numpy()), jnp.asarray(spk.numpy()),
            jax.random.PRNGKey(0),
        )
        e = np.asarray(e_mel)
        m = np.asarray(mel)[..., : e.shape[-1]]
        assert m.shape == e.shape, (m.shape, e.shape)
        np.testing.assert_allclose(m, e, atol=1e-3)
