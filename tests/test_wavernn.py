"""WaveRNN tests: torch-replica forward parity for all 3 variants +
fold/unfold + generation behavior."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rtvc_tpu.config.vocoder import MODE_BITS, MODE_MOL, MODE_RAW
from rtvc_tpu.models.wavernn import (
    VOC_FATCHORD,
    VOC_GENEING,
    VOC_RUNTIMERACER,
    WaveRNNDims,
    fold_with_overlap,
    import_torch_state,
    init_wavernn,
    upsample_forward,
    wavernn_forward,
    wavernn_generate,
    xfade_and_unfold,
)


# ---------------------------------------------------------------------------
# Torch oracle (reference structure, ref: vocoder/models/fatchord_version.py)
# ---------------------------------------------------------------------------


class _ResBlock(torch.nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.conv1 = torch.nn.Conv1d(dims, dims, 1, bias=False)
        self.conv2 = torch.nn.Conv1d(dims, dims, 1, bias=False)
        self.batch_norm1 = torch.nn.BatchNorm1d(dims)
        self.batch_norm2 = torch.nn.BatchNorm1d(dims)

    def forward(self, x):
        residual = x
        x = F.relu(self.batch_norm1(self.conv1(x)))
        x = self.batch_norm2(self.conv2(x))
        return x + residual


class _MelResNet(torch.nn.Module):
    def __init__(self, res_blocks, in_dims, compute_dims, res_out_dims, pad):
        super().__init__()
        self.conv_in = torch.nn.Conv1d(in_dims, compute_dims, 2 * pad + 1, bias=False)
        self.batch_norm = torch.nn.BatchNorm1d(compute_dims)
        self.layers = torch.nn.ModuleList(
            [_ResBlock(compute_dims) for _ in range(res_blocks)]
        )
        self.conv_out = torch.nn.Conv1d(compute_dims, res_out_dims, 1)

    def forward(self, x):
        x = F.relu(self.batch_norm(self.conv_in(x)))
        for f in self.layers:
            x = f(x)
        return self.conv_out(x)


class _Stretch2d(torch.nn.Module):
    def __init__(self, x_scale, y_scale):
        super().__init__()
        self.x_scale, self.y_scale = x_scale, y_scale

    def forward(self, x):
        b, c, h, w = x.size()
        x = x.unsqueeze(-1).unsqueeze(3)
        x = x.repeat(1, 1, 1, self.y_scale, 1, self.x_scale)
        return x.view(b, c, h * self.y_scale, w * self.x_scale)


class _UpsampleNetwork(torch.nn.Module):
    def __init__(self, feat_dims, scales, compute_dims, res_blocks, res_out, pad):
        super().__init__()
        total = int(np.prod(scales))
        self.indent = pad * total
        self.resnet = _MelResNet(res_blocks, feat_dims, compute_dims, res_out, pad)
        self.resnet_stretch = _Stretch2d(total, 1)
        self.up_layers = torch.nn.ModuleList()
        for s in scales:
            conv = torch.nn.Conv2d(1, 1, (1, 2 * s + 1), padding=(0, s), bias=False)
            conv.weight.data.fill_(1.0 / (2 * s + 1))
            self.up_layers.extend([_Stretch2d(s, 1), conv])

    def forward(self, m):
        aux = self.resnet_stretch(self.resnet(m).unsqueeze(1)).squeeze(1)
        m = m.unsqueeze(1)
        for f in self.up_layers:
            m = f(m)
        m = m.squeeze(1)[:, :, self.indent : -self.indent]
        return m.transpose(1, 2), aux.transpose(1, 2)


class _TorchWaveRNN(torch.nn.Module):
    """Oracle with per-variant structure of the reference forwards."""

    def __init__(self, d):
        super().__init__()
        self.d = d
        aux = d.aux_dims
        self.upsample = _UpsampleNetwork(
            d.feat_dims, d.upsample_factors, d.compute_dims, d.res_blocks,
            d.res_out_dims, d.pad,
        )
        self.I = torch.nn.Linear(d.feat_dims + aux, d.rnn_dims)
        if d.variant == VOC_FATCHORD:
            self.rnn1 = torch.nn.GRU(d.rnn_dims, d.rnn_dims, batch_first=True)
            self.rnn2 = torch.nn.GRU(d.rnn_dims + aux, d.rnn_dims, batch_first=True)
            self.fc1 = torch.nn.Linear(d.rnn_dims + aux, d.fc_dims)
            self.fc2 = torch.nn.Linear(d.fc_dims + aux, d.fc_dims)
            self.fc3 = torch.nn.Linear(d.fc_dims, d.n_classes)
        elif d.variant == VOC_GENEING:
            self.rnn1 = torch.nn.GRU(d.rnn_dims, d.rnn_dims, batch_first=True)
            self.fc1 = torch.nn.Linear(d.rnn_dims + aux, d.fc_dims)
            self.fc3 = torch.nn.Linear(d.fc_dims, d.n_classes)
        else:
            self.rnn1 = torch.nn.GRU(d.rnn_dims, d.rnn_dims, batch_first=True)
            self.rnn2 = torch.nn.GRU(d.rnn_dims, d.rnn_dims, batch_first=True)
            self.rnn3 = torch.nn.GRU(d.rnn_dims + aux, d.rnn_dims, batch_first=True)
            self.rnn4 = torch.nn.GRU(d.rnn_dims, d.rnn_dims, batch_first=True)
            self.fc1 = torch.nn.Linear(d.rnn_dims + aux, d.fc_dims)
            self.fc2 = torch.nn.Linear(d.fc_dims, d.fc_dims)
            self.fc3 = torch.nn.Linear(d.fc_dims + aux, d.fc_dims)
            self.fc4 = torch.nn.Linear(d.fc_dims, d.fc_dims)
            self.fc5 = torch.nn.Linear(d.fc_dims, d.n_classes)

    def forward(self, x, mels):
        d = self.d
        aux_d = d.aux_dims
        mels, aux = self.upsample(mels)
        splits = [aux[:, :, aux_d * i : aux_d * (i + 1)] for i in range(d.n_aux_splits)]
        x = torch.cat([x.unsqueeze(-1), mels, splits[0][:, :, :-1]], dim=2)
        x = self.I(x)
        if d.variant == VOC_FATCHORD:
            res = x
            x = self.rnn1(x)[0] + res
            res = x
            x = self.rnn2(torch.cat([x, splits[1]], dim=2))[0] + res
            x = F.relu(self.fc1(torch.cat([x, splits[2]], dim=2)))
            x = F.relu(self.fc2(torch.cat([x, splits[3]], dim=2)))
            return self.fc3(x)
        if d.variant == VOC_GENEING:
            res = x
            x = self.rnn1(x)[0] + res
            x = F.relu(self.fc1(torch.cat([x, splits[1]], dim=2)))
            x = self.fc3(x)
            return F.log_softmax(x, dim=-1) if d.mode == MODE_BITS else x
        res = x
        x = self.rnn1(x)[0] + res
        res = x
        x = self.rnn2(x)[0] + res
        res = x
        x = self.rnn3(torch.cat([x, splits[1]], dim=2))[0] + res
        res = x
        x = self.rnn4(x)[0] + res
        x = self.fc1(torch.cat([x, splits[2]], dim=2))
        x = F.relu(self.fc2(x))
        x = self.fc3(torch.cat([x, splits[3]], dim=2))
        x = F.relu(self.fc4(x))
        return self.fc5(x)


def _dims(variant, mode):
    return WaveRNNDims(
        variant=variant, mode=mode, rnn_dims=16, fc_dims=16, bits=4, pad=2,
        upsample_factors=(2, 2, 5), feat_dims=10, compute_dims=8,
        res_out_dims=16, res_blocks=2, hop_length=20, sample_rate=1000,
    )


def _parity_check(variant, mode, atol=1e-4):
    torch.manual_seed(0)
    d = _dims(variant, mode)
    oracle = _TorchWaveRNN(d).eval()
    B, frames = 2, 12
    seq = (frames - 2 * d.pad) * d.total_scale
    x = torch.rand(B, seq) * 2 - 1
    mels = torch.randn(B, d.feat_dims, frames)
    with torch.no_grad():
        expected = oracle(x, mels).numpy()
    variables = import_torch_state(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, d
    )
    ours, _ = wavernn_forward(
        variables, d, jnp.asarray(x.numpy()), jnp.asarray(mels.numpy()), train=False
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=atol)


class TestForwardParity:
    def test_fatchord_raw(self):
        _parity_check(VOC_FATCHORD, MODE_RAW)

    def test_geneing_bits(self):
        _parity_check(VOC_GENEING, MODE_BITS)

    def test_runtimeracer_raw(self):
        _parity_check(VOC_RUNTIMERACER, MODE_RAW)

    def test_fatchord_mol(self):
        _parity_check(VOC_FATCHORD, MODE_MOL)


class TestUpsample:
    def test_shapes(self):
        d = _dims(VOC_FATCHORD, MODE_RAW)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        mels = jnp.asarray(np.random.default_rng(0).standard_normal((1, 10, 12)),
                           jnp.float32)
        m, aux, _ = upsample_forward(
            variables["params"]["upsample"], variables["batch_stats"]["upsample"],
            d, mels,
        )
        T = (12 - 2 * d.pad) * d.total_scale
        assert m.shape == (1, T, 10)
        assert aux.shape == (1, T, d.res_out_dims)


class TestFoldUnfold:
    def test_fold_shapes_and_content(self):
        T, C, target, overlap = 100, 3, 20, 10
        x = jnp.asarray(
            np.arange(T * C, dtype=np.float32).reshape(1, T, C)
        )
        folded, n = fold_with_overlap(x, target, overlap)
        assert folded.shape == (n, target + 2 * overlap, C)
        # fold i starts at i*(target+overlap) (ref: fatchord_version.py:334-338)
        np.testing.assert_array_equal(
            np.asarray(folded[1]), np.asarray(x[0, 30 : 30 + 40])
        )

    def test_unfold_matches_reference_math(self):
        """Oracle: literal numpy re-derivation of ref
        fatchord_version.py:342-404 (silence + equal-power fades + staggered
        overlap-add)."""
        target, overlap = 40, 16
        rng = np.random.default_rng(0)
        num_folds = 4
        y = rng.standard_normal((num_folds, target + 2 * overlap))

        # oracle
        total_len = num_folds * (target + overlap) + overlap
        silence_len = overlap // 2
        fade_len = overlap - silence_len
        t = np.linspace(-1, 1, fade_len)
        fade_in = np.concatenate([np.zeros(silence_len), np.sqrt(0.5 * (1 + t))])
        fade_out = np.concatenate([np.sqrt(0.5 * (1 - t)), np.zeros(silence_len)])
        yy = y.copy()
        yy[:, :overlap] *= fade_in
        yy[:, -overlap:] *= fade_out
        expected = np.zeros(total_len)
        for i in range(num_folds):
            start = i * (target + overlap)
            expected[start : start + target + 2 * overlap] += yy[i]

        ours = np.asarray(
            xfade_and_unfold(jnp.asarray(y, jnp.float32), target, overlap)
        )
        np.testing.assert_allclose(ours, expected, atol=1e-5)


class TestGenerate:
    def test_batched_generation_shapes_and_range(self):
        d = _dims(VOC_FATCHORD, MODE_RAW)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        frames = 30
        mels = np.random.default_rng(0).standard_normal((10, frames)).astype(np.float32)
        wav = wavernn_generate(
            variables, d, mels, jax.random.PRNGKey(1), batched=True,
            target=100, overlap=40, mu_law=True, apply_preemphasis=False,
        )
        assert wav.shape == ((frames - 1) * d.hop_length,)
        assert np.isfinite(wav).all()

    def test_same_key_same_audio(self):
        d = _dims(VOC_GENEING, MODE_BITS)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        mels = np.random.default_rng(0).standard_normal((10, 20)).astype(np.float32)
        w1 = wavernn_generate(variables, d, mels, jax.random.PRNGKey(7),
                              batched=False, mu_law=False, apply_preemphasis=False)
        w2 = wavernn_generate(variables, d, mels, jax.random.PRNGKey(7),
                              batched=False, mu_law=False, apply_preemphasis=False)
        np.testing.assert_array_equal(w1, w2)
        w3 = wavernn_generate(variables, d, mels, jax.random.PRNGKey(8),
                              batched=False, mu_law=False, apply_preemphasis=False)
        assert not np.array_equal(w1, w3)

    def test_all_variants_and_modes_run(self):
        cases = [
            (VOC_FATCHORD, MODE_RAW),
            (VOC_FATCHORD, MODE_MOL),
            (VOC_GENEING, MODE_BITS),
            (VOC_GENEING, MODE_RAW),  # beta head
            (VOC_RUNTIMERACER, MODE_RAW),
        ]
        mels = np.random.default_rng(0).standard_normal((10, 16)).astype(np.float32)
        for variant, mode in cases:
            d = _dims(variant, mode)
            variables = init_wavernn(jax.random.PRNGKey(0), d)
            wav = wavernn_generate(
                variables, d, mels, jax.random.PRNGKey(1), batched=False,
                apply_preemphasis=False,
            )
            assert wav.shape == (15 * d.hop_length,), (variant, mode)
            assert np.isfinite(wav).all(), (variant, mode)
