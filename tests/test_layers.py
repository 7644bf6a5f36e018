"""Layer-library tests with torch oracles (gate order, padding, norm
semantics)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rtvc_tpu.models.layers import (
    CBHG,
    GRU,
    BatchNorm1d,
    Conv1d,
    GRUCell,
    LengthRegulator,
    Linear,
    LSTMCell,
)


def _import_named(torch_module, rename=None):
    """torch state_dict → nested flax params dict by splitting on '.'"""
    out = {}
    for k, v in torch_module.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v.numpy())
    return out


class TestGRU:
    def test_matches_torch_bidirectional(self):
        torch.manual_seed(1)
        I, H, B, T = 12, 16, 3, 9
        ref = torch.nn.GRU(I, H, batch_first=True, bidirectional=True)
        x = torch.randn(B, T, I)
        with torch.no_grad():
            expected, _ = ref(x)

        params = {
            k: jnp.asarray(v.numpy()) for k, v in ref.state_dict().items()
        }
        ours, _ = GRU(H, bidirectional=True).apply(
            {"params": params}, jnp.asarray(x.numpy())
        )
        np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=1e-5)

    def test_cell_matches_torch(self):
        torch.manual_seed(2)
        I, H, B = 8, 16, 4
        ref = torch.nn.GRUCell(I, H)
        x, h = torch.randn(B, I), torch.randn(B, H)
        with torch.no_grad():
            expected = ref(x, h)
        params = {k: jnp.asarray(v.numpy()) for k, v in ref.state_dict().items()}
        ours = GRUCell(H).apply(
            {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(h.numpy())
        )
        np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=1e-5)


class TestLSTMCell:
    def test_matches_torch(self):
        torch.manual_seed(3)
        I, H, B = 8, 16, 4
        ref = torch.nn.LSTMCell(I, H)
        x, h, c = torch.randn(B, I), torch.randn(B, H), torch.randn(B, H)
        with torch.no_grad():
            eh, ec = ref(x, (h, c))
        params = {k: jnp.asarray(v.numpy()) for k, v in ref.state_dict().items()}
        oh, oc = LSTMCell(H).apply(
            {"params": params},
            jnp.asarray(x.numpy()),
            (jnp.asarray(h.numpy()), jnp.asarray(c.numpy())),
        )
        np.testing.assert_allclose(np.asarray(oh), eh.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(oc), ec.numpy(), atol=1e-5)


class TestConv1d:
    def test_matches_torch_odd_and_even_kernels(self):
        for k in (1, 2, 3, 8, 16, 31):
            torch.manual_seed(k)
            ref = torch.nn.Conv1d(6, 10, k, padding=k // 2)
            x = torch.randn(2, 6, 20)  # (B, C, T)
            with torch.no_grad():
                expected = ref(x).numpy()
            params = {k2: jnp.asarray(v.numpy()) for k2, v in ref.state_dict().items()}
            ours = Conv1d(10, k, padding=k // 2).apply(
                {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1))
            )
            np.testing.assert_allclose(
                np.asarray(ours).transpose(0, 2, 1), expected, atol=1e-5,
                err_msg=f"kernel={k}",
            )


class TestBatchNorm:
    def test_inference_matches_torch(self):
        torch.manual_seed(4)
        ref = torch.nn.BatchNorm1d(6).eval()
        with torch.no_grad():
            ref.running_mean += torch.randn(6)
            ref.running_var *= torch.rand(6) + 0.5
        x = torch.randn(3, 6, 11)
        with torch.no_grad():
            expected = ref(x).numpy()
        variables = {
            "params": {
                "weight": jnp.asarray(ref.weight.detach().numpy()),
                "bias": jnp.asarray(ref.bias.detach().numpy()),
            },
            "batch_stats": {
                "running_mean": jnp.asarray(ref.running_mean.numpy()),
                "running_var": jnp.asarray(ref.running_var.numpy()),
            },
        }
        ours = BatchNorm1d(6).apply(
            variables, jnp.asarray(x.numpy().transpose(0, 2, 1)), train=False
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), expected, atol=1e-5
        )


class _TorchHighway(torch.nn.Module):
    def __init__(self, size):
        super().__init__()
        self.W1 = torch.nn.Linear(size, size)
        self.W2 = torch.nn.Linear(size, size)

    def forward(self, x):
        g = torch.sigmoid(self.W2(x))
        return g * torch.relu(self.W1(x)) + (1.0 - g) * x


class _TorchBNConv(torch.nn.Module):
    def __init__(self, cin, cout, k, relu=True):
        super().__init__()
        self.conv = torch.nn.Conv1d(cin, cout, k, stride=1, padding=k // 2, bias=False)
        self.bnorm = torch.nn.BatchNorm1d(cout)
        self.relu = relu

    def forward(self, x):
        x = self.conv(x)
        if self.relu:
            x = torch.relu(x)
        return self.bnorm(x)


class _TorchCBHG(torch.nn.Module):
    """Oracle mirroring the reference Tacotron CBHG structure
    (ref: synthesizer/models/tacotron.py:63-141)."""

    def __init__(self, K, in_channels, channels, proj_channels, num_highways):
        super().__init__()
        self.conv1d_bank = torch.nn.ModuleList(
            [_TorchBNConv(in_channels, channels, k) for k in range(1, K + 1)]
        )
        self.maxpool = torch.nn.MaxPool1d(2, stride=1, padding=1)
        self.conv_project1 = _TorchBNConv(K * channels, proj_channels[0], 3)
        self.conv_project2 = _TorchBNConv(proj_channels[0], proj_channels[1], 3, relu=False)
        self.highway_mismatch = proj_channels[-1] != channels
        if self.highway_mismatch:
            self.pre_highway = torch.nn.Linear(proj_channels[-1], channels, bias=False)
        self.highways = torch.nn.ModuleList(
            [_TorchHighway(channels) for _ in range(num_highways)]
        )
        self.rnn = torch.nn.GRU(channels, channels // 2, batch_first=True, bidirectional=True)

    def forward(self, x):
        residual = x
        seq_len = x.size(-1)
        conv_bank = torch.cat([c(x)[:, :, :seq_len] for c in self.conv1d_bank], dim=1)
        x = self.maxpool(conv_bank)[:, :, :seq_len]
        x = self.conv_project1(x)
        x = self.conv_project2(x)
        x = x + residual
        x = x.transpose(1, 2)
        if self.highway_mismatch:
            x = self.pre_highway(x)
        for h in self.highways:
            x = h(x)
        x, _ = self.rnn(x)
        return x


class TestCBHG:
    def test_matches_torch_reference_structure(self):
        torch.manual_seed(5)
        K, C, B, T = 4, 8, 2, 12
        ref = _TorchCBHG(K, C, C, [C, C], 2).eval()
        x = torch.randn(B, C, T)
        with torch.no_grad():
            expected = ref(x).numpy()

        sd = ref.state_dict()
        from rtvc_tpu.models.tacotron import _import_cbhg

        imported = _import_cbhg(
            {k: v.numpy() for k, v in sd.items()}, "", K, 2
        )
        ours = CBHG(
            K=K, in_channels=C, channels=C, proj_channels=(C, C), num_highways=2
        ).apply(
            {"params": imported["params"], "batch_stats": imported["batch_stats"]},
            jnp.asarray(x.numpy().transpose(0, 2, 1)),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-4)


class TestLengthRegulator:
    def test_matches_repeat_interleave(self):
        x = jnp.asarray(np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3))
        dur = jnp.asarray([[2, 0, 1, 3], [1, 1, 1, 1]])
        max_len = 8
        out = LengthRegulator().apply({"params": {}}, x, dur, max_len)
        # Oracle: numpy repeat + pad
        for b in range(2):
            expanded = np.repeat(np.asarray(x[b]), np.asarray(dur[b]), axis=0)
            np.testing.assert_allclose(
                np.asarray(out[b, : expanded.shape[0]]), expanded
            )
        assert out.shape == (2, max_len, 3)
