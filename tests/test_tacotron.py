"""Tacotron tests: full-model torch-replica parity (teacher-forced) + generate
behavior."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.models.tacotron import (
    TacotronDims,
    import_torch_state,
    init_tacotron,
    tacotron_forward,
    tacotron_generate,
)
from tests.test_layers import _TorchCBHG, _TorchHighway, _TorchBNConv


# ---------------------------------------------------------------------------
# Torch oracle: reference Tacotron structure, dropout disabled for determinism
# (ref: synthesizer/models/tacotron.py:12-391)
# ---------------------------------------------------------------------------


class _TorchPreNet(torch.nn.Module):
    def __init__(self, in_dims, fc1, fc2):
        super().__init__()
        self.fc1 = torch.nn.Linear(in_dims, fc1)
        self.fc2 = torch.nn.Linear(fc1, fc2)

    def forward(self, x):
        return torch.relu(self.fc2(torch.relu(self.fc1(x))))


class _TorchEncoder(torch.nn.Module):
    def __init__(self, embed_dims, num_chars, encoder_dims, K, num_highways):
        super().__init__()
        self.embedding = torch.nn.Embedding(num_chars, embed_dims)
        self.pre_net = _TorchPreNet(embed_dims, encoder_dims, encoder_dims)
        self.cbhg = _TorchCBHG(K, encoder_dims, encoder_dims,
                               [encoder_dims, encoder_dims], num_highways)

    def forward(self, x, spk):
        x = self.embedding(x)
        x = self.pre_net(x)
        x = self.cbhg(x.transpose(1, 2))
        e = spk[:, None, :].expand(-1, x.size(1), -1)
        return torch.cat([x, e], dim=2)


class _TorchLSA(torch.nn.Module):
    def __init__(self, attn_dim, kernel_size=31, filters=32):
        super().__init__()
        self.conv = torch.nn.Conv1d(1, filters, kernel_size,
                                    padding=(kernel_size - 1) // 2, bias=True)
        self.L = torch.nn.Linear(filters, attn_dim, bias=False)
        self.W = torch.nn.Linear(attn_dim, attn_dim, bias=True)
        self.v = torch.nn.Linear(attn_dim, 1, bias=False)

    def forward(self, enc_proj, query, cumulative, chars):
        q = self.W(query).unsqueeze(1)
        loc = self.L(self.conv(cumulative.unsqueeze(1)).transpose(1, 2))
        u = self.v(torch.tanh(q + enc_proj + loc)).squeeze(-1)
        u = u * (chars != 0).float()
        return F.softmax(u, dim=1)


class _TorchTacotron(torch.nn.Module):
    max_r = 20

    def __init__(self, d):
        super().__init__()
        self.d = d
        self.encoder = _TorchEncoder(d.embed_dims, d.num_chars, d.encoder_dims,
                                     d.encoder_K, d.num_highways)
        enc_out = d.encoder_dims + d.speaker_embedding_size
        self.encoder_proj = torch.nn.Linear(enc_out, d.decoder_dims, bias=False)
        pre = d.decoder_dims * 2
        self.prenet = _TorchPreNet(d.n_mels, pre, pre)
        self.attn_net = _TorchLSA(d.decoder_dims)
        self.attn_rnn = torch.nn.GRUCell(d.encoder_dims + pre + d.speaker_embedding_size,
                                         d.decoder_dims)
        self.rnn_input = torch.nn.Linear(enc_out + d.decoder_dims, d.lstm_dims)
        self.res_rnn1 = torch.nn.LSTMCell(d.lstm_dims, d.lstm_dims)
        self.res_rnn2 = torch.nn.LSTMCell(d.lstm_dims, d.lstm_dims)
        self.mel_proj = torch.nn.Linear(d.lstm_dims, d.n_mels * self.max_r, bias=False)
        self.stop_proj = torch.nn.Linear(enc_out + d.lstm_dims, 1)
        self.postnet = _TorchCBHG(d.postnet_K, d.n_mels, d.postnet_dims,
                                  [d.postnet_dims, d.fft_bins], d.num_highways)
        self.post_proj = torch.nn.Linear(d.postnet_dims, d.fft_bins, bias=False)

    def forward(self, x, m, spk, r):
        d = self.d
        B, _, steps = m.shape
        attn_hidden = torch.zeros(B, d.decoder_dims)
        rnn1_h = torch.zeros(B, d.lstm_dims); rnn1_c = torch.zeros(B, d.lstm_dims)
        rnn2_h = torch.zeros(B, d.lstm_dims); rnn2_c = torch.zeros(B, d.lstm_dims)
        context = torch.zeros(B, d.encoder_dims + d.speaker_embedding_size)
        cumulative = torch.zeros(B, x.size(1))
        go = torch.zeros(B, d.n_mels)

        enc_seq = self.encoder(x, spk)
        enc_proj = self.encoder_proj(enc_seq)

        mels, attns, stops = [], [], []
        for t in range(0, steps, r):
            prenet_in = m[:, :, t - 1] if t > 0 else go
            pre = self.prenet(prenet_in)
            attn_hidden = self.attn_rnn(torch.cat([context, pre], dim=-1), attn_hidden)
            scores = self.attn_net(enc_proj, attn_hidden, cumulative, x)
            cumulative = cumulative + scores
            context = (scores.unsqueeze(1) @ enc_seq).squeeze(1)
            z = self.rnn_input(torch.cat([context, attn_hidden], dim=1))
            h1, rnn1_c = self.res_rnn1(z, (rnn1_h, rnn1_c)); rnn1_h = h1
            z = z + rnn1_h
            h2, rnn2_c = self.res_rnn2(z, (rnn2_h, rnn2_c)); rnn2_h = h2
            z = z + rnn2_h
            mel = self.mel_proj(z).view(B, d.n_mels, self.max_r)[:, :, :r]
            stop = torch.sigmoid(self.stop_proj(torch.cat([z, context], dim=1)))
            mels.append(mel); attns.append(scores); stops.extend([stop] * r)
        mel_out = torch.cat(mels, dim=2)
        post = self.postnet(mel_out)
        linear = self.post_proj(post).transpose(1, 2)
        return (mel_out, linear, torch.stack(attns, 1),
                torch.cat(stops, 1))


def _dims():
    cfg = TacotronParams(
        embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
        encoder_K=2, lstm_dims=32, postnet_K=2, num_highways=2, dropout=0.0,
    )
    # fft_bins == n_mels, matching the reference factory
    # (ref: synthesizer/models/base.py:25-26)
    return cfg, TacotronDims.from_config(cfg, num_chars=20, n_mels=6,
                                         fft_bins=6, spk=8)


def _rename_state(sd):
    """Torch replica state names → reference names expected by the importer."""
    out = {}
    for k, v in sd.items():
        k = k.replace("prenet.", "decoder.prenet.") if k.startswith("prenet.") else k
        for nm in ("attn_net", "attn_rnn", "rnn_input", "res_rnn1", "res_rnn2",
                   "mel_proj", "stop_proj"):
            if k.startswith(nm + "."):
                k = "decoder." + k
        out[k] = v.numpy()
    return out


class TestForwardParity:
    def test_matches_torch_replica(self):
        torch.manual_seed(0)
        cfg, d = _dims()
        oracle = _TorchTacotron(d).eval()

        B, T_text, steps, r = 2, 10, 8, 2
        x = torch.randint(1, d.num_chars, (B, T_text))
        m = torch.randn(B, d.n_mels, steps)
        spk = torch.randn(B, d.speaker_embedding_size)
        with torch.no_grad():
            e_mel, e_lin, e_attn, e_stop = oracle(x, m, spk, r)

        variables = import_torch_state(_rename_state(oracle.state_dict()), d)
        mel, lin, attn, stop, _ = tacotron_forward(
            variables, d, jnp.asarray(x.numpy()), jnp.asarray(m.numpy()),
            jnp.asarray(spk.numpy()), r, jax.random.PRNGKey(0), train=False,
        )
        np.testing.assert_allclose(np.asarray(mel), e_mel.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(attn), e_attn.numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(stop), e_stop.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(lin), e_lin.numpy(), atol=1e-3)


class TestGenerate:
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
