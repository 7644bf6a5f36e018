"""Parity vs the GENUINE reference output distributions
(/root/reference/vocoder/distribution.py): discretized mixture-of-logistics
loss, MoL sampling (common randomness), beta-distribution moments, and
log_sum_exp."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rtvc_tpu.models.distribution import (
    discretized_mix_logistic_loss,
    log_sum_exp,
    sample_from_beta_dist,
    sample_from_discretized_mix_logistic,
)
from tests.ref_oracle import ref_module


def _dist():
    return ref_module("vocoder.distribution")


class TestMoLLoss:
    def test_loss_matches_reference(self):
        d = _dist()
        g = torch.Generator().manual_seed(0)
        B, T, C = 2, 40, 30  # 10 mixtures × 3 params
        y_hat = torch.randn(B, T, C, generator=g)
        y = (torch.rand(B, T, 1, generator=g) * 2 - 1) * 0.98
        with torch.no_grad():
            # ref loss takes (B, T, C) and permutes internally
            expected = d.discretized_mix_logistic_loss(
                y_hat, y, reduce=True
            ).numpy()
        ours = discretized_mix_logistic_loss(
            jnp.asarray(y_hat.transpose(1, 2).numpy()), jnp.asarray(y.numpy())
        )
        np.testing.assert_allclose(float(ours), float(expected), rtol=1e-5)

    def test_loss_matches_reference_extreme_targets(self):
        """Edge buckets (y = ±1) exercise the one-sided CDF branches."""
        d = _dist()
        g = torch.Generator().manual_seed(1)
        B, T, C = 1, 16, 30
        y_hat = torch.randn(B, T, C, generator=g)
        y = torch.where(
            torch.rand(B, T, 1, generator=g) > 0.5,
            torch.ones(B, T, 1),
            -torch.ones(B, T, 1),
        )
        with torch.no_grad():
            # ref loss takes (B, T, C) and permutes internally
            expected = d.discretized_mix_logistic_loss(
                y_hat, y, reduce=True
            ).numpy()
        ours = discretized_mix_logistic_loss(
            jnp.asarray(y_hat.transpose(1, 2).numpy()), jnp.asarray(y.numpy())
        )
        np.testing.assert_allclose(float(ours), float(expected), rtol=1e-5)

    def test_log_sum_exp_matches(self):
        d = _dist()
        g = torch.Generator().manual_seed(2)
        x = torch.randn(5, 7, generator=g)
        np.testing.assert_allclose(
            np.asarray(log_sum_exp(jnp.asarray(x.numpy()))),
            d.log_sum_exp(x).numpy(),
            atol=1e-6,
        )


class TestMoLSample:
    def test_sample_matches_reference_with_common_randomness(self):
        """Sampling is RNG-framework-specific; inject the same uniforms into
        both implementations and the samples must agree exactly
        (ref vocoder/distribution.py:104-140)."""
        d = _dist()
        g = torch.Generator().manual_seed(3)
        B, T, C = 2, 8, 30
        y_hat = torch.randn(B, T, C, generator=g)
        rng = np.random.default_rng(4)
        u_sel = rng.uniform(1e-5, 1 - 1e-5, (B, T, 10)).astype(np.float32)
        u_smp = rng.uniform(1e-5, 1 - 1e-5, (B, T, 1)).astype(np.float32)

        # Reference path with patched RNG: uniform_ fills
        orig = torch.Tensor.uniform_
        fills = [torch.from_numpy(u_sel), torch.from_numpy(u_smp)]

        def fake_uniform_(self, a=0.0, b=1.0):
            # inject the pre-drawn uniforms verbatim (already in (a, b))
            self.copy_(fills.pop(0).reshape(self.shape))
            return self

        torch.Tensor.uniform_ = fake_uniform_
        try:
            with torch.no_grad():
                expected = d.sample_from_discretized_mix_logistic(
                    y_hat.transpose(1, 2)
                ).numpy()
        finally:
            torch.Tensor.uniform_ = orig

        ours = sample_from_discretized_mix_logistic(
            None,
            jnp.asarray(y_hat.transpose(1, 2).numpy()),
            uniforms=(jnp.asarray(u_sel), jnp.asarray(u_smp[..., 0])),
        )
        np.testing.assert_allclose(
            np.asarray(ours), expected.reshape(np.asarray(ours).shape), atol=1e-5
        )


class TestBeta:
    def test_beta_sample_moments_match_reference(self):
        """Beta sampling can't share randomness across frameworks; check the
        distribution itself: same (alpha, beta) field → matching sample mean/
        var, support [-1, 1] (ref vocoder/distribution.py:7-20)."""
        d = _dist()
        g = torch.Generator().manual_seed(5)
        B, T = 4, 4096
        y_hat = torch.randn(B, T, 2, generator=g) * 0.5
        torch.manual_seed(0)
        with torch.no_grad():
            ref_s = d.sample_from_beta_dist(y_hat).numpy()
        ours = np.asarray(
            sample_from_beta_dist(jax.random.PRNGKey(0), jnp.asarray(y_hat.numpy()))
        )
        assert ours.shape == ref_s.reshape(ours.shape).shape
        assert ours.min() >= -1.0 and ours.max() <= 1.0
        np.testing.assert_allclose(
            ours.mean(axis=1).ravel(), ref_s.mean(axis=1).ravel(), atol=0.02
        )
        np.testing.assert_allclose(
            ours.var(axis=1).ravel(), ref_s.var(axis=1).ravel(), atol=0.02
        )
