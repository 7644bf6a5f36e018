"""ForwardTacotron behavior tests: packed BiLSTM semantics + generate
controls.

Full-model parity against the GENUINE reference implementation lives in
tests/ref_oracle/test_ref_forward_tacotron.py — no torch replicas here.
"""
import numpy as np
import pytest
import torch
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import ForwardTacotronParams
from rtvc_tpu.models.forward_tacotron import (
    ForwardTacotronDims,
    bilstm_packed,
    forward_generate,
    init_forward_tacotron,
)


def _dims():
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
    return cfg, ForwardTacotronDims.from_config(cfg, num_chars=20, n_mels=6, spk=8)


class TestPackedBiLSTM:
    def test_matches_torch_pack_padded(self):
        torch.manual_seed(0)
        B, T, I, H = 3, 10, 6, 8
        ref = torch.nn.LSTM(I, H, batch_first=True, bidirectional=True)
        x = torch.randn(B, T, I)
        lens = torch.tensor([10, 7, 4])
        packed = pack_padded_sequence(x, lens, batch_first=True, enforce_sorted=False)
        with torch.no_grad():
            out, _ = ref(packed)
        expected, _ = pad_packed_sequence(out, padding_value=-11.5,
                                          batch_first=True, total_length=T)
        params = {k: jnp.asarray(v.numpy()) for k, v in ref.state_dict().items()}
        ours = bilstm_packed(params, jnp.asarray(x.numpy()),
                             jnp.asarray(lens.numpy()), -11.5)
        np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=1e-5)


@pytest.mark.slow  # generation graphs take ~1 min to compile on CPU
class TestGenerate:
    def test_generate_shapes_and_speed_control(self):
        cfg, d = _dims()
        variables = init_forward_tacotron(jax.random.PRNGKey(0), d)
        B, T_text = 2, 9
        x = jnp.asarray(np.random.default_rng(0).integers(1, d.num_chars, (B, T_text)))
        spk = jnp.asarray(
            np.random.default_rng(1).standard_normal((B, d.speaker_embedding_size)),
            jnp.float32,
        )
        mel, durs = forward_generate(variables, d, x, spk, jax.random.PRNGKey(2))
        assert mel.shape[0] == B and mel.shape[1] == d.n_mels
        assert durs.shape == (B, T_text)
        assert (durs >= 0).all()

        # alpha scales durations (speed control): alpha=2 → roughly double
        mel2, durs2 = forward_generate(
            variables, d, x, spk, jax.random.PRNGKey(2), alpha=2.0
        )
        assert durs2.sum() >= durs.sum()

    def test_pitch_energy_functions_applied(self):
        cfg, d = _dims()
        variables = init_forward_tacotron(jax.random.PRNGKey(0), d)
        x = jnp.ones((1, 5), jnp.int32)
        spk = jnp.zeros((1, d.speaker_embedding_size))
        m1, _ = forward_generate(variables, d, x, spk, jax.random.PRNGKey(0))
        m2, _ = forward_generate(
            variables, d, x, spk, jax.random.PRNGKey(0),
            pitch_function=lambda p: p + 10.0,
        )
        assert not np.allclose(m1, m2)
