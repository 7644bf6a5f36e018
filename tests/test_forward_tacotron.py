"""ForwardTacotron tests: torch-replica parity (training forward + generate)
and the packed-BiLSTM equivalence."""
import numpy as np
import torch
import torch.nn.functional as F
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import ForwardTacotronParams
from rtvc_tpu.models.forward_tacotron import (
    ForwardTacotronDims,
    bilstm_packed,
    forward_generate,
    forward_tacotron_forward,
    import_torch_state,
    init_forward_tacotron,
)
from tests.test_layers import _TorchBNConv, _TorchHighway


class _TorchForwardCBHG(torch.nn.Module):
    """common_layers CBHG variant (ref: common_layers.py:55-119), eval mode
    (dropout off)."""

    def __init__(self, K, in_channels, channels, proj_channels, num_highways):
        super().__init__()
        self.conv1d_bank = torch.nn.ModuleList(
            [_TorchBNConv(in_channels, channels, k) for k in range(1, K + 1)]
        )
        self.maxpool = torch.nn.MaxPool1d(2, stride=1, padding=1)
        self.conv_project1 = _TorchBNConv(K * channels, proj_channels[0], 3)
        self.conv_project2 = _TorchBNConv(
            proj_channels[0], proj_channels[1], 3, relu=False
        )
        self.pre_highway = torch.nn.Linear(proj_channels[-1], channels, bias=False)
        self.highways = torch.nn.ModuleList(
            [_TorchHighway(channels) for _ in range(num_highways)]
        )
        self.rnn = torch.nn.GRU(channels, channels, batch_first=True,
                                bidirectional=True)

    def forward(self, x):
        residual = x
        seq_len = x.size(-1)
        conv_bank = torch.cat(
            [c(x)[:, :, :seq_len] for c in self.conv1d_bank], dim=1
        )
        x = self.maxpool(conv_bank)[:, :, :seq_len]
        x = self.conv_project1(x)
        x = self.conv_project2(x)
        x = x + residual
        x = x.transpose(1, 2)
        x = self.pre_highway(x)
        for h in self.highways:
            x = h(x)
        x, _ = self.rnn(x)
        return x


class _TorchSeries(torch.nn.Module):
    def __init__(self, num_chars, emb, spk, conv, rnn):
        super().__init__()
        self.embedding = torch.nn.Embedding(num_chars, emb)
        self.convs = torch.nn.ModuleList(
            [
                _TorchBNConv(emb + spk, conv, 5),
                _TorchBNConv(conv, conv, 5),
                _TorchBNConv(conv, conv, 5),
            ]
        )
        self.rnn = torch.nn.GRU(conv, rnn, batch_first=True, bidirectional=True)
        self.lin = torch.nn.Linear(2 * rnn, 1)

    def forward(self, x, spk_emb, alpha=1.0):
        x = self.embedding(x)
        spk = spk_emb[:, None, :].repeat(1, x.shape[1], 1)
        x = torch.cat([x, spk], dim=2).transpose(1, 2)
        for conv in self.convs:
            x = conv(x)
        x = x.transpose(1, 2)
        x, _ = self.rnn(x)
        return self.lin(x) / alpha


class _TorchForwardTacotron(torch.nn.Module):
    """Oracle mirroring ref forward_tacotron.py:47-260 (eval mode)."""

    def __init__(self, d):
        super().__init__()
        self.d = d
        self.embedding = torch.nn.Embedding(d.num_chars, d.embed_dims)
        self.dur_pred = _TorchSeries(d.num_chars, d.series_embed_dims,
                                     d.speaker_embedding_size,
                                     d.duration_conv_dims, d.duration_rnn_dims)
        self.pitch_pred = _TorchSeries(d.num_chars, d.series_embed_dims,
                                       d.speaker_embedding_size,
                                       d.pitch_conv_dims, d.pitch_rnn_dims)
        self.energy_pred = _TorchSeries(d.num_chars, d.series_embed_dims,
                                        d.speaker_embedding_size,
                                        d.energy_conv_dims, d.energy_rnn_dims)
        self.prenet = _TorchForwardCBHG(d.prenet_k, d.embed_dims, d.prenet_dims,
                                        [d.prenet_dims, d.embed_dims],
                                        d.prenet_num_highways)
        self.lstm = torch.nn.LSTM(2 * d.prenet_dims + d.speaker_embedding_size,
                                  d.rnn_dims, batch_first=True, bidirectional=True)
        self.lin = torch.nn.Linear(2 * d.rnn_dims, d.n_mels)
        self.postnet = _TorchForwardCBHG(d.postnet_k, d.n_mels, d.postnet_dims,
                                         [d.postnet_dims, d.n_mels],
                                         d.postnet_num_highways)
        self.post_proj = torch.nn.Linear(2 * d.postnet_dims, d.n_mels, bias=False)
        self.pitch_proj = torch.nn.Conv1d(1, 2 * d.prenet_dims, 3, padding=1)
        self.energy_proj = torch.nn.Conv1d(1, 2 * d.prenet_dims, 3, padding=1)

    def lr(self, x, dur):
        out = []
        for i in range(x.size(0)):
            out.append(torch.repeat_interleave(x[i], (dur[i] + 0.5).long(), dim=0))
        return torch.nn.utils.rnn.pad_sequence(out, batch_first=True)

    def forward(self, x, mel, dur, spk_emb, mel_lens, pitch, energy):
        d = self.d
        pitch = pitch.unsqueeze(1)
        energy = energy.unsqueeze(1)
        dur_hat = self.dur_pred(x, spk_emb).squeeze(-1)
        pitch_hat = self.pitch_pred(x, spk_emb).transpose(1, 2)
        energy_hat = self.energy_pred(x, spk_emb).transpose(1, 2)

        h = self.embedding(x).transpose(1, 2)
        h = self.prenet(h)
        h = h + self.pitch_proj(pitch).transpose(1, 2) * d.pitch_strength
        h = h + self.energy_proj(energy).transpose(1, 2) * d.energy_strength
        h = self.lr(h, dur)
        spk = spk_emb[:, None, :].repeat(1, h.shape[1], 1)
        h = torch.cat([h, spk], dim=2)
        h = pack_padded_sequence(h, lengths=mel_lens, enforce_sorted=False,
                                 batch_first=True)
        h, _ = self.lstm(h)
        h, _ = pad_packed_sequence(h, padding_value=d.padding_value,
                                   batch_first=True)
        m = self.lin(h).transpose(1, 2)
        post = self.post_proj(self.postnet(m)).transpose(1, 2)

        def pad(t, L):
            t = t[:, :, :L]
            return F.pad(t, [0, L - t.size(2), 0, 0], "constant", d.padding_value)

        return (pad(m, mel.size(2)), pad(post, mel.size(2)), dur_hat,
                pitch_hat, energy_hat)


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


class TestForwardParity:
    def test_training_forward_matches_torch(self):
        torch.manual_seed(1)
        cfg, d = _dims()
        oracle = _TorchForwardTacotron(d).eval()

        B, T_text = 2, 7
        x = torch.randint(1, d.num_chars, (B, T_text))
        dur = torch.tensor([[2, 1, 3, 1, 2, 1, 2], [1, 2, 1, 1, 1, 0, 0]]).float()
        mel_lens = dur.sum(dim=1).long()
        L = int(mel_lens.max())
        mel = torch.randn(B, d.n_mels, L)
        spk = torch.randn(B, d.speaker_embedding_size)
        pitch = torch.randn(B, T_text)
        energy = torch.randn(B, T_text)
        with torch.no_grad():
            e_mel, e_post, e_dur, e_pitch, e_energy = oracle(
                x, mel, dur, spk, mel_lens, pitch, energy
            )

        variables = import_torch_state(
            {k: v.numpy() for k, v in oracle.state_dict().items()}, d
        )
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
        np.testing.assert_allclose(np.asarray(pitch_hat), e_pitch.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(energy_hat), e_energy.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(mel_hat), e_mel.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(post_hat), e_post.numpy(), atol=1e-3)


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
