"""Parity vs the GENUINE reference Tacotron
(/root/reference/synthesizer/models/tacotron.py) — not a replica.

Identical weights flow through ``import_torch_state``; teacher-forced
forward and greedy generate must match. Dropout is 0 (the reference PreNet
applies dropout with training=True even in eval, so parity requires p=0).
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.models.tacotron import (
    TacotronDims,
    import_torch_state,
    tacotron_forward,
    tacotron_generate,
)
from tests.ref_oracle import ref_module, state_numpy


def _make_pair(seed=0):
    """(reference torch Tacotron, our dims) at small test dims."""
    taco_mod = ref_module("synthesizer.models.tacotron")
    cfg = TacotronParams(
        embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
        encoder_K=2, lstm_dims=32, postnet_K=2, num_highways=2, dropout=0.0,
    )
    d = TacotronDims.from_config(cfg, num_chars=20, n_mels=6, fft_bins=6,
                                 spk=8)
    torch.manual_seed(seed)
    ref = taco_mod.Tacotron(
        embed_dims=d.embed_dims, num_chars=d.num_chars,
        encoder_dims=d.encoder_dims, decoder_dims=d.decoder_dims,
        n_mels=d.n_mels, fft_bins=d.fft_bins, postnet_dims=d.postnet_dims,
        encoder_K=d.encoder_K, lstm_dims=d.lstm_dims, postnet_K=d.postnet_K,
        num_highways=d.num_highways, dropout=0.0, stop_threshold=-3.4,
        speaker_embedding_size=d.speaker_embedding_size,
    ).eval()
    return ref, d


class TestTeacherForcedParity:
    def test_forward_matches_reference(self):
        ref, d = _make_pair()
        r = 2
        ref.r = r
        B, T_text, steps = 2, 10, 8
        g = torch.Generator().manual_seed(1)
        x = torch.randint(1, d.num_chars, (B, T_text), generator=g)
        m = torch.randn(B, d.n_mels, steps, generator=g)
        spk = torch.randn(B, d.speaker_embedding_size, generator=g)
        with torch.no_grad():
            e_mel, e_lin, e_attn, e_stop = ref(x, m, spk)

        variables = import_torch_state(state_numpy(ref), d)
        mel, lin, attn, stop, _ = tacotron_forward(
            variables, d, jnp.asarray(x.numpy()), jnp.asarray(m.numpy()),
            jnp.asarray(spk.numpy()), r, jax.random.PRNGKey(0), train=False,
        )
        np.testing.assert_allclose(np.asarray(mel), e_mel.numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(attn), e_attn.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(stop), e_stop.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lin), e_lin.numpy(), atol=1e-3)

    def test_forward_matches_reference_r3(self):
        """Reduction factor 3 exercises the mel_proj max_r slicing path."""
        ref, d = _make_pair(seed=2)
        r = 3
        ref.r = r
        B, T_text, steps = 1, 7, 9
        g = torch.Generator().manual_seed(3)
        x = torch.randint(1, d.num_chars, (B, T_text), generator=g)
        m = torch.randn(B, d.n_mels, steps, generator=g)
        spk = torch.randn(B, d.speaker_embedding_size, generator=g)
        with torch.no_grad():
            e_mel, _, _, e_stop = ref(x, m, spk)
        variables = import_torch_state(state_numpy(ref), d)
        mel, _, _, stop, _ = tacotron_forward(
            variables, d, jnp.asarray(x.numpy()), jnp.asarray(m.numpy()),
            jnp.asarray(spk.numpy()), r, jax.random.PRNGKey(0), train=False,
        )
        np.testing.assert_allclose(np.asarray(mel), e_mel.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(stop), e_stop.numpy(), atol=1e-4)


class TestGenerateParity:
    def test_generate_matches_reference(self):
        """Greedy (dropout-0) generation: our while_loop decode must emit the
        reference generate()'s mel sequence (ref tacotron.py:393-450)."""
        ref, d = _make_pair(seed=4)
        r = 2
        ref.r = r
        # Keep the stop head silent so neither side stops early.
        with torch.no_grad():
            ref.decoder.stop_proj.bias.fill_(-10.0)

        B, T_text, steps = 2, 9, 12
        g = torch.Generator().manual_seed(5)
        x = torch.randint(1, d.num_chars, (B, T_text), generator=g)
        spk = torch.randn(B, d.speaker_embedding_size, generator=g)
        with torch.no_grad():
            e_mel, e_lin, e_attn = ref.generate(x, spk, steps=steps)

        variables = import_torch_state(state_numpy(ref), d)
        mel, lin, attn, n = tacotron_generate(
            variables, d, jnp.asarray(x.numpy()), jnp.asarray(spk.numpy()),
            r, jax.random.PRNGKey(0), max_steps=steps, compute_linear=True,
        )
        assert int(n) == steps  # no early stop on either side
        np.testing.assert_allclose(np.asarray(mel), e_mel.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(attn), e_attn.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lin), e_lin.numpy(), atol=1e-3)

    def test_generate_early_stop_matches_reference(self):
        """When the stop head fires, both sides must stop at the same step
        and the postnet must run length-exact over the decoded frames only
        (ref tacotron.py:425-441)."""
        ref, d = _make_pair(seed=6)
        r = 2
        ref.r = r
        with torch.no_grad():
            ref.decoder.stop_proj.bias.fill_(100.0)  # stop ASAP (t > 10 guard)

        B, T_text, max_steps = 2, 8, 40
        g = torch.Generator().manual_seed(7)
        x = torch.randint(1, d.num_chars, (B, T_text), generator=g)
        spk = torch.randn(B, d.speaker_embedding_size, generator=g)
        with torch.no_grad():
            e_mel, e_lin, e_attn = ref.generate(x, spk, steps=max_steps)

        variables = import_torch_state(state_numpy(ref), d)
        mel, lin, attn, n = tacotron_generate(
            variables, d, jnp.asarray(x.numpy()), jnp.asarray(spk.numpy()),
            r, jax.random.PRNGKey(0), max_steps=max_steps, compute_linear=True,
        )
        n = int(n)
        assert n == e_mel.shape[-1], (n, e_mel.shape)
        assert n < max_steps  # it really stopped early
        np.testing.assert_allclose(
            np.asarray(mel)[:, :, :n], e_mel.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(lin)[:, :, :n], e_lin.numpy(), atol=1e-3
        )
