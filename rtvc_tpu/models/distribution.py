"""Output distributions for WaveRNN: discretized mixture of logistics + beta.

JAX rebuild of the reference's torch implementations (ref:
vocoder/distribution.py:7-140) with explicit PRNG keys. Used by the MOL-mode
WaveRNN head (loss + sampling) and the geneing RAW mode (beta sampling).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def log_sum_exp(x: jax.Array) -> jax.Array:
    """Numerically stable logsumexp over the last axis
    (ref: distribution.py:23-29)."""
    m = jnp.max(x, axis=-1)
    m2 = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m2), axis=-1))


def discretized_mix_logistic_loss(
    y_hat: jax.Array,
    y: jax.Array,
    num_classes: int = 65536,
    log_scale_min: Optional[float] = None,
    reduce: bool = True,
) -> jax.Array:
    """Negative log-likelihood of a discretized logistic mixture
    (ref: distribution.py:33-101).

    y_hat: (B, C, T) raw head output with C = 3·nr_mix; y: (B, T, 1) targets
    in [-1, 1].
    """
    if log_scale_min is None:
        log_scale_min = float(math.log(1e-14))
    assert y_hat.shape[1] % 3 == 0
    nr_mix = y_hat.shape[1] // 3

    y_hat = jnp.transpose(y_hat, (0, 2, 1))  # (B, T, C)
    logit_probs = y_hat[:, :, :nr_mix]
    means = y_hat[:, :, nr_mix : 2 * nr_mix]
    log_scales = jnp.maximum(y_hat[:, :, 2 * nr_mix : 3 * nr_mix], log_scale_min)

    y = jnp.broadcast_to(y, means.shape)

    centered_y = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_y + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered_y - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min

    mid_in = inv_stdv * centered_y
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - math.log((num_classes - 1) / 2),
    )
    inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)

    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    nll = -log_sum_exp(log_probs)
    if reduce:
        return jnp.mean(nll)
    return nll[..., None]


def sample_from_discretized_mix_logistic(
    key: Optional[jax.Array],
    y: jax.Array,
    log_scale_min: Optional[float] = None,
    uniforms: Optional[tuple] = None,
) -> jax.Array:
    """Sample in [-1, 1] from a logistic mixture; y is (B, C, T)
    (ref: distribution.py:104-140).

    ``uniforms`` optionally injects the two uniform draws — (mixture-select
    (B, T, nr_mix), logistic (B, T)), both already in (1e-5, 1-1e-5) — so
    cross-framework parity tests can feed identical randomness to this and
    the reference implementation."""
    if log_scale_min is None:
        log_scale_min = float(math.log(1e-14))
    assert y.shape[1] % 3 == 0
    nr_mix = y.shape[1] // 3

    y = jnp.transpose(y, (0, 2, 1))  # (B, T, C)
    logit_probs = y[:, :, :nr_mix]

    if uniforms is not None:
        temp, u_inj = uniforms
    else:
        k_mix, k_u = jax.random.split(key)
        temp = jax.random.uniform(
            k_mix, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5
        )
    argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(temp)), axis=-1)
    one_hot = jax.nn.one_hot(argmax, nr_mix, dtype=y.dtype)

    means = jnp.sum(y[:, :, nr_mix : 2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y[:, :, 2 * nr_mix : 3 * nr_mix] * one_hot, axis=-1), log_scale_min
    )
    if uniforms is not None:
        u = u_inj
    else:
        u = jax.random.uniform(k_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)


def sample_from_beta_dist(key: jax.Array, y_hat: jax.Array) -> jax.Array:
    """Sample in [-1, 1] from a Beta(exp(a), exp(b)) head; y_hat is
    (B, T, 2) (ref: distribution.py:7-20)."""
    loc_y = jnp.exp(y_hat)
    alpha = loc_y[..., 0]
    beta = loc_y[..., 1]
    sample = jax.random.beta(key, alpha, beta)
    return 2.0 * sample - 1.0
