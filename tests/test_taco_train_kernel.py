"""Parity tests for the fused train-mode Tacotron decoder kernel
(ops/pallas/tacotron_train_kernel.py, interpret mode on CPU).

Two oracles:
  * a pure-JAX ``lax.scan`` mirror of the kernel equations (this file) —
    checks the kernel + its hand-written VJP against ``jax.grad`` of the
    same math, for values AND gradients of every input;
  * the integration test (test_tacotron_hoist.py extension) pins the fused
    branch of ``tacotron_forward`` against the hoisted XLA path on real
    model params.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu.ops.pallas.tacotron_train_kernel import (
    _KW,
    taco_decoder_train_fused,
)

D, L, E, T, N, B = 128, 128, 128, 40, 10, 4


def _rand_weights(rng):
    def r(*shape, s=0.3):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    gwh = r(D, 3 * D)
    gbh = r(1, 3 * D)
    wq = r(D, D)
    bq = r(1, D)
    mloc = jnp.concatenate([r(31, D), jnp.zeros((1, D), jnp.float32)], 0)
    vv = r(1, D)
    wri = r(E + D, L)
    bri = r(1, L)
    l1wi, l1wh, l1b = r(L, 4 * L), r(L, 4 * L), r(1, 4 * L)
    l2wi, l2wh, l2b = r(L, 4 * L), r(L, 4 * L), r(1, 4 * L)
    gwi_ctx = r(E, 3 * D)
    return (gwh, gbh, wq, bq, mloc, vv, wri, bri,
            l1wi, l1wh, l1b, l2wi, l2wh, l2b, gwi_ctx)


def _ref_decoder(weights, xg_pre, enc_seq, enc_proj, char_mask, amask,
                 zo1, zo2):
    """Pure-JAX mirror of the kernel equations (the differentiable
    oracle)."""
    (gwh, gbh, wq, bq, mloc, vv, wri, bri,
     l1wi, l1wh, l1b, l2wi, l2wh, l2b, gwi_ctx) = weights
    n, b, _ = xg_pre.shape

    def loc_term(cum):
        cp = jnp.pad(cum, ((0, 0), (16, 16)))
        win = jnp.stack(
            [cp[:, k + 1:k + 1 + T] for k in range(31)]
            + [jnp.zeros_like(cum)], axis=2,
        )
        return (win.reshape(b * T, _KW) @ mloc).reshape(b, T, D)

    def lstm(x, h_prev, c_prev, wi, wh, bias, zo):
        g = x @ wi + h_prev @ wh + bias[0]
        i = jax.nn.sigmoid(g[:, :L])
        f = jax.nn.sigmoid(g[:, L:2 * L])
        gg = jnp.tanh(g[:, 2 * L:3 * L])
        o = jax.nn.sigmoid(g[:, 3 * L:])
        c = f * c_prev + i * gg
        h = zo * h_prev + (1.0 - zo) * (o * jnp.tanh(c))
        return h, c

    def body(carry, inp):
        ah, h1, c1, h2, c2, ctx, cum = carry
        xg_p, z1, z2 = inp
        xg = xg_p + ctx @ gwi_ctx
        hg = ah @ gwh + gbh[0]
        r = jax.nn.sigmoid(xg[:, :D] + hg[:, :D])
        z = jax.nn.sigmoid(xg[:, D:2 * D] + hg[:, D:2 * D])
        nn_ = jnp.tanh(xg[:, 2 * D:] + r * hg[:, 2 * D:])
        ah = (1.0 - z) * nn_ + z * ah

        q = ah @ wq + bq[0]
        tv = jnp.tanh(q[:, None, :] + enc_proj + loc_term(cum))
        u = jnp.sum(tv * vv[0][None, None, :], axis=2)
        u = u * char_mask + amask
        scores = jax.nn.softmax(u, axis=1)
        cum = cum + scores
        ctx = jnp.sum(scores[:, :, None] * enc_seq, axis=1)

        x0 = jnp.concatenate([ctx, ah], axis=1) @ wri + bri[0]
        h1, c1 = lstm(x0, h1, c1, l1wi, l1wh, l1b, z1)
        x1 = x0 + h1
        h2, c2 = lstm(x1, h2, c2, l2wi, l2wh, l2b, z2)
        x2 = x1 + h2
        return (ah, h1, c1, h2, c2, ctx, cum), (x2, ctx, scores)

    carry0 = (
        jnp.zeros((b, D)), jnp.zeros((b, L)), jnp.zeros((b, L)),
        jnp.zeros((b, L)), jnp.zeros((b, L)), jnp.zeros((b, E)),
        jnp.zeros((b, T)),
    )
    _, (x_all, ctx_all, scores_all) = jax.lax.scan(
        body, carry0, (xg_pre, zo1, zo2)
    )
    return x_all, ctx_all, scores_all


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    weights = _rand_weights(rng)
    xg_pre = jnp.asarray(rng.standard_normal((N, B, 3 * D)), jnp.float32)
    enc_seq = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32) * 0.5
    enc_proj = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.5
    char_mask = jnp.asarray(
        (np.arange(T)[None, :] < rng.integers(T - 8, T, B)[:, None]),
        jnp.float32,
    )
    amask = jnp.zeros((B, T), jnp.float32)
    zo1 = jnp.asarray(
        rng.random((N, B, L)) < 0.1, jnp.float32
    )
    zo2 = jnp.asarray(rng.random((N, B, L)) < 0.1, jnp.float32)
    return weights, xg_pre, enc_seq, enc_proj, char_mask, amask, zo1, zo2


class TestForwardParity:
    def test_outputs_match_scan_mirror(self, inputs):
        ref = _ref_decoder(*inputs)
        out = taco_decoder_train_fused(*inputs, interpret=True)
        for name, a, b in zip(("x", "ctx", "scores"), out, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=name,
            )


@pytest.mark.slow  # interpret-mode VJP on CPU (~1 min) — full gate only
class TestGradParity:
    def test_grads_match_scan_mirror(self, inputs):
        cot_seed = np.random.default_rng(7)
        # random cotangents on every output exercise all three paths
        cw = [
            jnp.asarray(cot_seed.standard_normal((N, B, L)), jnp.float32),
            jnp.asarray(cot_seed.standard_normal((N, B, E)), jnp.float32),
            jnp.asarray(cot_seed.standard_normal((N, B, T)), jnp.float32),
        ]

        def loss_fused(weights, xg, es, ep):
            x, c, s = taco_decoder_train_fused(
                weights, xg, es, ep, *inputs[4:], interpret=True
            )
            return jnp.sum(x * cw[0]) + jnp.sum(c * cw[1]) \
                + jnp.sum(s * cw[2])

        def loss_ref(weights, xg, es, ep):
            x, c, s = _ref_decoder(weights, xg, es, ep, *inputs[4:])
            return jnp.sum(x * cw[0]) + jnp.sum(c * cw[1]) \
                + jnp.sum(s * cw[2])

        args = inputs[:4]
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        flat_f, _ = jax.tree_util.tree_flatten(g_fused)
        flat_r, _ = jax.tree_util.tree_flatten(g_ref)
        assert len(flat_f) == len(flat_r)
        for i, (a, b) in enumerate(zip(flat_f, flat_r)):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=5e-4, atol=5e-4, err_msg=f"grad leaf {i}",
            )


# ---------------------------------------------------------------------------
# Integration: tacotron_forward(fused=True) ≡ hoisted XLA path
# ---------------------------------------------------------------------------


def _setup_model():
    from rtvc_tpu.config.synthesizer import TacotronParams
    from rtvc_tpu.models.tacotron import TacotronDims, init_tacotron

    # E = 2·encoder_dims + spk = 128; decoder/lstm dims 128-multiples
    cfg = TacotronParams(
        embed_dims=16, encoder_dims=32, decoder_dims=128, postnet_dims=8,
        encoder_K=2, lstm_dims=128, postnet_K=2, num_highways=2,
        dropout=0.0, max_r=5,
    )
    d = TacotronDims.from_config(cfg, num_chars=20, n_mels=6, fft_bins=6,
                                 spk=64)
    variables = init_tacotron(jax.random.PRNGKey(0), d)
    rng = np.random.default_rng(42)
    r, steps = 3, 12
    chars = jnp.asarray(rng.integers(1, d.num_chars, (2, 9)), jnp.int32)
    mels = jnp.asarray(rng.standard_normal((2, d.n_mels, steps)),
                       jnp.float32)
    spk = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    return d, variables, chars, mels, spk, r


class TestIntegration:
    def test_fused_forward_matches_hoisted(self, monkeypatch):
        from rtvc_tpu.models import tacotron as taco

        monkeypatch.setenv("RTVC_TACO_TRAIN_INTERPRET", "1")
        # zero zoneout: the fused path draws masks batched, the scan path
        # per step — only at p=0 are both paths deterministic-identical
        monkeypatch.setattr(taco, "_ZONEOUT_P", 0.0)
        d, v, chars, mels, spk, r = _setup_model()

        def run(fused):
            return taco.tacotron_forward(
                v, d, chars, mels, spk, r, jax.random.PRNGKey(3),
                train=True, hoisted=True, fused=fused,
            )

        m_f, l_f, a_f, s_f, _ = run(True)
        m_x, l_x, a_x, s_x, _ = run(False)
        np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_x),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_x),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_x),
                                   atol=1e-4)

    @pytest.mark.slow  # interpret-mode VJP through the full model (~2 min)
    def test_fused_gradients_match_hoisted(self, monkeypatch):
        from rtvc_tpu.models import tacotron as taco

        monkeypatch.setenv("RTVC_TACO_TRAIN_INTERPRET", "1")
        monkeypatch.setattr(taco, "_ZONEOUT_P", 0.0)
        d, v, chars, mels, spk, r = _setup_model()

        def loss(params, fused):
            vv = {"params": params, "batch_stats": v["batch_stats"]}
            m, lin, a, s, _ = taco.tacotron_forward(
                vv, d, chars, mels, spk, r, jax.random.PRNGKey(3),
                train=True, hoisted=True, fused=fused,
            )
            return (jnp.mean(m ** 2) + jnp.mean(lin ** 2)
                    + jnp.mean(s) + 0.1 * jnp.mean(a ** 2))

        g_f = jax.grad(lambda p: loss(p, True))(v["params"])
        g_x = jax.grad(lambda p: loss(p, False))(v["params"])
        flat_f, tree_f = jax.tree_util.tree_flatten(g_f)
        flat_x, tree_x = jax.tree_util.tree_flatten(g_x)
        assert tree_f == tree_x
        paths = jax.tree_util.tree_flatten_with_path(g_f)[0]
        for (path, a), b in zip(paths, flat_x):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-4)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=2e-3, atol=2e-3,
                err_msg=jax.tree_util.keystr(path),
            )
