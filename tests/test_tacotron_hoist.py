"""Hoisted teacher-forced decoder scan ≡ the per-step oracle path.

``tacotron_forward(hoisted=True)`` (the train-path default) moves the
prenet, the prenet half of the attention-GRU input projection, and the
mel/stop output projections out of the decoder scan — pure algebra, so
values AND gradients must match the per-step path that the genuine-ref
parity oracles pin down (tests/ref_oracle/test_ref_tacotron.py). Dropout
is rate-0 at these dims, and both paths draw identical zoneout masks
(same per-step key split), so train=True compares exactly too.
"""
import numpy as np

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.models.tacotron import (
    TacotronDims,
    init_tacotron,
    tacotron_forward,
)


def _setup(r=3, steps=9, B=2, T_text=7, max_r=5):
    cfg = TacotronParams(
        embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
        encoder_K=2, lstm_dims=32, postnet_K=2, num_highways=2, dropout=0.0,
        max_r=max_r,
    )
    d = TacotronDims.from_config(cfg, num_chars=20, n_mels=6, fft_bins=6,
                                 spk=8)
    variables = init_tacotron(jax.random.PRNGKey(0), d)
    rng = np.random.default_rng(42)
    chars = jnp.asarray(rng.integers(1, d.num_chars, (B, T_text)), jnp.int32)
    mels = jnp.asarray(rng.standard_normal((B, d.n_mels, steps)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    return d, variables, chars, mels, spk, r


def _run(d, variables, chars, mels, spk, r, *, hoisted, train):
    return tacotron_forward(
        variables, d, chars, mels, spk, r, jax.random.PRNGKey(3),
        train=train, hoisted=hoisted,
    )


class TestHoistedEquivalence:
    def test_forward_values_match(self):
        """r < max_r exercises the sliced mel_proj weight gather."""
        d, v, chars, mels, spk, r = _setup()
        m_h, l_h, a_h, s_h, _ = _run(d, v, chars, mels, spk, r,
                                     hoisted=True, train=False)
        m_o, l_o, a_o, s_o, _ = _run(d, v, chars, mels, spk, r,
                                     hoisted=False, train=False)
        np.testing.assert_allclose(np.asarray(m_h), np.asarray(m_o),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a_h), np.asarray(a_o),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_h), np.asarray(s_o),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(l_h), np.asarray(l_o),
                                   atol=1e-4)

    def test_train_mode_zoneout_matches(self):
        """train=True: both paths split the per-step key the same way, so
        the zoneout masks (the only stochastic part at dropout-0 dims) are
        identical and outputs still match exactly."""
        d, v, chars, mels, spk, r = _setup()
        m_h, _, _, s_h, _ = _run(d, v, chars, mels, spk, r,
                                 hoisted=True, train=True)
        m_o, _, _, s_o, _ = _run(d, v, chars, mels, spk, r,
                                 hoisted=False, train=True)
        np.testing.assert_allclose(np.asarray(m_h), np.asarray(m_o),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_h), np.asarray(s_o),
                                   atol=1e-5)

    def test_gradients_match(self):
        """The custom hoisting must not change the backward pass: grads of
        the Tacotron train loss wrt every param agree between paths."""
        d, v, chars, mels, spk, r = _setup()

        def loss(params, hoisted):
            var = {"params": params, "batch_stats": v["batch_stats"]}
            m1, m2, _, stop, _ = tacotron_forward(
                var, d, chars, mels, spk, r, jax.random.PRNGKey(3),
                train=True, hoisted=hoisted,
            )
            return (jnp.mean((m1 - mels) ** 2) + jnp.mean(jnp.abs(m2))
                    + jnp.mean(stop))

        g_h = jax.grad(lambda p: loss(p, True))(v["params"])
        g_o = jax.grad(lambda p: loss(p, False))(v["params"])
        flat_h, _ = jax.tree_util.tree_flatten_with_path(g_h)
        flat_o, _ = jax.tree_util.tree_flatten(g_o)
        assert len(flat_h) == len(flat_o)
        for (path, gh), go in zip(flat_h, flat_o):
            np.testing.assert_allclose(
                np.asarray(gh), np.asarray(go), atol=2e-5,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_full_r_equals_max_r(self):
        """r == max_r: the mel_proj slice is the identity gather."""
        d, v, chars, mels, spk, r = _setup(r=5, steps=10, max_r=5)
        m_h, _, _, _, _ = _run(d, v, chars, mels, spk, r,
                               hoisted=True, train=False)
        m_o, _, _, _, _ = _run(d, v, chars, mels, spk, r,
                               hoisted=False, train=False)
        np.testing.assert_allclose(np.asarray(m_h), np.asarray(m_o),
                                   atol=1e-5)


class TestHoistedBf16Policy:
    def test_bf16_compute_policy_trains(self):
        """The TPU default combination (hoisted decoder + bf16 compute
        policy) must produce finite losses and flowing gradients; the f32
        islands (attention softmax, cumulative scores) keep the alignment
        math in f32."""
        import optax

        from rtvc_tpu.models import factories
        from rtvc_tpu.train.steps import make_tacotron_train_step

        cfg = TacotronParams(
            embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
            encoder_K=2, lstm_dims=32, postnet_K=2, num_highways=2,
        )
        bundle = factories.init_syn_model(
            factories.MODEL_TYPE_TACOTRON, override_hp=cfg
        )
        d = bundle.dims
        opt = optax.adam(1e-3)
        step = make_tacotron_train_step(d, opt, r=2,
                                        compute_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        B = 4
        batch = {
            "chars": jnp.asarray(rng.integers(1, d.num_chars, (B, 8)),
                                 jnp.int32),
            "mels": jnp.asarray(rng.standard_normal((B, d.n_mels, 6)),
                                jnp.float32),
            "embeds": jnp.asarray(
                rng.standard_normal((B, d.speaker_embedding_size)),
                jnp.float32),
            "stop": jnp.ones((B, 6), jnp.float32),
        }
        p = bundle.variables["params"]
        s = bundle.variables["batch_stats"]
        o = opt.init(p)
        losses = []
        for i in range(3):
            p, s, o, st, _ = step(p, s, o, batch, jax.random.PRNGKey(i))
            losses.append(float(st["loss"]))
        assert all(np.isfinite(losses)), losses
        # params stay f32 under the policy (mixed-precision contract)
        leaves = jax.tree_util.tree_leaves(p)
        assert all(leaf.dtype == jnp.float32 for leaf in leaves)
