"""Dual-softmax ("deepmind") WaveRNN — the component the reference ships
as dead code (vocoder/models/deepmind_version.py imports a nonexistent
utils.dsp and is absent from the factory). No reference oracle can run, so
the gates are: an independent numpy transcription of the paper's cell
equations, sampling-path ≡ teacher-forced-path logit consistency, and a
tiny overfit."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtvc_tpu.models.wavernn_deepmind import (
    DeepMindDims,
    deepmind_forward,
    deepmind_generate,
    deepmind_loss,
    generate,
    init_deepmind,
)


@pytest.fixture(scope="module")
def small():
    d = DeepMindDims(hidden=32, quantisation=256)
    variables = init_deepmind(jax.random.PRNGKey(0), d)
    return d, variables


def _np_forward(p, d, coarse, fine):
    """Independent per-step numpy recomputation of the ref cell
    (deepmind_version.py:37-72): one R(hidden) projection, gates
    u/r/e with r gating R_e, coarse/fine input projections interleaved."""
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    B, T = coarse.shape
    h = np.zeros((B, d.hidden))
    s = d.split
    out_c = np.zeros((B, T - 1, d.quantisation))
    out_f = np.zeros((B, T - 1, d.quantisation))
    lin = lambda q, x: x @ np.asarray(q["weight"]).T + (
        np.asarray(q["bias"]) if "bias" in q else 0.0)
    for t in range(1, T):
        prev_y = np.stack([coarse[:, t - 1] / 127.5 - 1.0,
                           fine[:, t - 1] / 127.5 - 1.0], -1)
        cur_c = (coarse[:, t] / 127.5 - 1.0)[:, None]
        r_h = h @ np.asarray(p["R"]["weight"]).T
        r_u, r_r, r_e = np.split(r_h, 3, axis=1)
        icu, icr, ice = np.split(lin(p["I_coarse"], prev_y), 3, axis=1)
        ifu, ifr, ife = np.split(
            lin(p["I_fine"], np.concatenate([prev_y, cur_c], 1)), 3, axis=1)
        i_u = np.concatenate([icu, ifu], 1)
        i_r = np.concatenate([icr, ifr], 1)
        i_e = np.concatenate([ice, ife], 1)
        u = sig(r_u + i_u + np.asarray(p["bias_u"]))
        r = sig(r_r + i_r + np.asarray(p["bias_r"]))
        e = np.tanh(r * r_e + i_e + np.asarray(p["bias_e"]))
        h = u * h + (1.0 - u) * e
        out_c[:, t - 1] = lin(p["O2"], np.maximum(lin(p["O1"], h[:, :s]), 0))
        out_f[:, t - 1] = lin(p["O4"], np.maximum(lin(p["O3"], h[:, s:]), 0))
    return out_c, out_f


def test_forward_matches_numpy_oracle(small):
    d, variables = small
    rng = np.random.default_rng(1)
    coarse = rng.integers(0, 256, (2, 9)).astype(np.int32)
    fine = rng.integers(0, 256, (2, 9)).astype(np.int32)
    lc, lf = deepmind_forward(variables, d, jnp.asarray(coarse),
                              jnp.asarray(fine))
    oc, of = _np_forward(variables["params"], d, coarse, fine)
    np.testing.assert_allclose(np.asarray(lc), oc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lf), of, atol=1e-4)


def test_generate_logits_match_teacher_forced(small):
    """The sampling scan (split half-steps) and the hoisted training path
    must be the same network: teacher-forcing the generated labels through
    deepmind_forward reproduces the exact logits each sample was drawn
    from."""
    d, variables = small
    wav, cs, fs, lcs, lfs = deepmind_generate(
        variables, d, jax.random.PRNGKey(3), seq_len=17, batch=2,
        return_logits=True)
    zero = jnp.zeros((2, 1), cs.dtype)
    lc, lf = deepmind_forward(variables, d,
                              jnp.concatenate([zero, cs], 1),
                              jnp.concatenate([zero, fs], 1))
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lcs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lfs), atol=1e-4)
    assert wav.shape == (2, 17)
    assert float(jnp.abs(wav).max()) <= 1.0
    # same key → same waveform (through the cached-jit entry point, which
    # must equal the eager path); different key → different
    wav2 = generate(variables, d, jax.random.PRNGKey(3),
                    seq_len=17, batch=2)[0]
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(wav2))
    wav3 = generate(variables, d, jax.random.PRNGKey(4),
                    seq_len=17, batch=2)[0]
    assert not np.array_equal(np.asarray(wav), np.asarray(wav3))


def test_overfit_tiny_sine():
    """Dual-softmax CE drives both 8-bit heads onto a deterministic
    waveform (split_signal 16-bit coarse/fine targets)."""
    import optax

    from rtvc_tpu.ops.audio import split_signal

    d = DeepMindDims(hidden=48, quantisation=256)
    variables = init_deepmind(jax.random.PRNGKey(0), d)
    t = np.arange(260)
    wav = (0.7 * np.sin(2 * np.pi * t / 13)).astype(np.float32)
    x16 = jnp.asarray(np.round(wav * (2**15 - 1)).astype(np.int32))
    coarse, fine = split_signal(x16)
    coarse = jnp.stack([coarse[:130], coarse[130:]]).astype(jnp.int32)
    fine = jnp.stack([fine[:130], fine[130:]]).astype(jnp.int32)

    opt = optax.adam(3e-3)
    state = opt.init(variables)

    @jax.jit
    def step(variables, state):
        loss, grads = jax.value_and_grad(deepmind_loss)(
            variables, d, coarse, fine)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(variables, updates), state, loss

    first = None
    for _ in range(120):
        variables, state, loss = step(variables, state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.4 * first, (first, float(loss))
