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


class TestGRULengths:
    def test_lengths_match_torch_pack_padded(self):
        """Our length-exact GRU (lengths=) vs torch on each unpadded
        sequence — the backward direction must start at each true last
        frame."""
        torch.manual_seed(6)
        I, H, B, T = 6, 8, 3, 10
        ref = torch.nn.GRU(I, H, batch_first=True, bidirectional=True)
        x = torch.randn(B, T, I)
        lens = [10, 7, 4]
        params = {k: jnp.asarray(v.numpy()) for k, v in ref.state_dict().items()}
        ours, _ = GRU(H, bidirectional=True).apply(
            {"params": params}, jnp.asarray(x.numpy()),
            lengths=jnp.asarray(lens),
        )
        for b, n in enumerate(lens):
            with torch.no_grad():
                exp, _ = ref(x[b : b + 1, :n])
            np.testing.assert_allclose(
                np.asarray(ours)[b, :n], exp.numpy()[0], atol=1e-5
            )
            # pad outputs are zeroed
            np.testing.assert_allclose(np.asarray(ours)[b, n:], 0.0, atol=0)


class TestCBHG:
    def test_matches_genuine_reference_tacotron_cbhg(self):
        """Parity vs the REAL reference CBHG (synthesizer/models/
        tacotron.py:63-141), not a replica."""
        from tests.ref_oracle import ref_module, state_numpy

        taco_mod = ref_module("synthesizer.models.tacotron")
        torch.manual_seed(5)
        K, C, B, T = 4, 8, 2, 12
        ref = taco_mod.CBHG(K, C, C, [C, C], 2).eval()
        x = torch.randn(B, C, T)
        with torch.no_grad():
            expected = ref(x).numpy()

        from rtvc_tpu.models.tacotron import _import_cbhg

        imported = _import_cbhg(state_numpy(ref), "", K, 2)
        ours = CBHG(
            K=K, in_channels=C, channels=C, proj_channels=(C, C), num_highways=2
        ).apply(
            {"params": imported["params"], "batch_stats": imported["batch_stats"]},
            jnp.asarray(x.numpy().transpose(0, 2, 1)),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-4)

    def test_matches_genuine_reference_common_layers_cbhg(self):
        """Parity vs the REAL common_layers CBHG variant used by
        ForwardTacotron (common_layers.py:55-119): BiGRU hidden = channels,
        always pre_highway, dropout (off in eval)."""
        from tests.ref_oracle import ref_module, state_numpy

        cl_mod = ref_module("synthesizer.models.common_layers")
        torch.manual_seed(7)
        K, Cin, C, B, T = 3, 8, 10, 2, 12
        ref = cl_mod.CBHG(
            K=K, in_channels=Cin, channels=C, proj_channels=[C, Cin],
            num_highways=2, dropout=0.0,
        ).eval()
        x = torch.randn(B, Cin, T)
        with torch.no_grad():
            expected = ref(x).numpy()

        from rtvc_tpu.models.tacotron import _import_cbhg

        imported = _import_cbhg(state_numpy(ref), "", K, 2)
        ours = CBHG(
            K=K, in_channels=Cin, channels=C, proj_channels=(C, Cin),
            num_highways=2, forward_variant=True, dropout_rate=0.0,
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
