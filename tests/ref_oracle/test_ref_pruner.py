"""Pruning-mask parity vs the GENUINE reference Pruner
(vocoder/pruner.py): identical weights + sparsity → identical group-of-4
keep masks (per gate split), and the cubic sparsity ramp matches."""
import numpy as np
import torch

import jax.numpy as jnp

from rtvc_tpu.train.pruning import cubic_sparsity, group_prune_mask
from tests.ref_oracle import ref_module


class TestMaskParity:
    def _ref_mask(self, W, z, sparse_group, layer):
        mod = ref_module("vocoder.pruner")
        pm = mod.PruneMask(layer, prune_rnn_input=False)
        pm.update_mask(layer, z, sparse_group)
        return pm.mask[0].numpy()

    def test_linear_mask_matches(self):
        torch.manual_seed(0)
        layer = torch.nn.Linear(64, 48)
        W = list(layer.parameters())[0].data
        for z in (0.2, 0.5, 0.9):
            expected = self._ref_mask(W, z, 4, layer)
            ours = np.asarray(group_prune_mask(
                jnp.asarray(W.numpy()), jnp.asarray(z), 4, splits=1
            ))
            np.testing.assert_array_equal(ours, expected, err_msg=str(z))

    def test_gru_gate_splits_match(self):
        torch.manual_seed(1)
        layer = torch.nn.GRU(32, 24)
        # reference prunes parameter index 1 (weight_hh) when
        # prune_rnn_input=False
        W = list(layer.parameters())[1].data  # (3*24, 24)
        expected = self._ref_mask(W, 0.6, 4, layer)
        ours = np.asarray(group_prune_mask(
            jnp.asarray(W.numpy()), jnp.asarray(0.6), 4, splits=3
        ))
        np.testing.assert_array_equal(ours, expected)
        # per-gate thresholds really differ from a single global one
        single = np.asarray(group_prune_mask(
            jnp.asarray(W.numpy()), jnp.asarray(0.6), 4, splits=1
        ))
        assert not np.array_equal(single, expected)


class TestSparsityRamp:
    def test_cubic_ramp_matches_reference(self):
        """z(t) = Z·(1 − (1 − (t−t0)/S)³) clamped to [0, Z]
        (ref vocoder/pruner.py:110-113)."""
        mod = ref_module("vocoder.pruner")
        pruner = mod.Pruner(start_prune=100, prune_steps=1000,
                            target_sparsity=0.9, sparse_group=4)
        for step in (0, 50, 100, 101, 350, 600, 1100, 5000):
            expected = pruner.update_sparsity(step, 0.9)
            ours = float(cubic_sparsity(jnp.asarray(step), 100, 1000, 0.9))
            np.testing.assert_allclose(ours, expected, atol=1e-7,
                                       err_msg=str(step))
