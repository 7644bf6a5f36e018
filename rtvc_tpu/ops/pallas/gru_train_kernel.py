"""Pallas TPU kernel: fused train-time GRU sequence (forward + VJP).

The WaveRNN training step spends its serial time in teacher-forced GRU
scans (`models/wavernn.py:_gru_seq`): `lax.scan` emits one XLA While
iteration per sample, re-streaming the 3 MB hidden-side weight matrix
from HBM and paying loop overhead 2×T times per step (T = 1000 at the
reference's first-session schedule, ref: vocoder/train.py:93-117 batch
shapes). This kernel runs the whole sequence inside ONE kernel launch:

  * grid = time tiles (sequential on TPU); the hidden state lives in
    VMEM scratch and persists across tiles;
  * `W_hh` is fetched into VMEM once (constant index_map) and reused by
    every timestep — the scan path re-reads it from HBM each iteration;
  * the precomputed input projections `xg` (the parallel, MXU-friendly
    half of the GRU — computed outside as one big matmul) stream
    HBM→VMEM per tile, double-buffered by Pallas;
  * the backward pass is a second Pallas kernel that walks the tiles in
    REVERSE (index_map `n_tiles-1-i`), carrying `dh` in scratch. Only
    the truly sequential work stays in-kernel: the per-step gate math
    and the single `dhg @ W_hh` matvec of the dh chain. Everything
    batchable over time — `dW_hh = Σ_t h_{t-1}ᵀ dhg_t`, `db_hh = Σ dhg`
    — is hoisted out of the kernel into one large XLA einsum over the
    streamed `dxg`/gate residuals, where the MXU runs it in parallel.

Forward residuals are the per-step gate activations (r, z, n, hn) — a
(T, B, 4H) stream — plus the output sequence itself; the backward kernel
therefore needs NO recompute matmul in its dependency chain.

Numerics: gate math and both matmuls run in f32 regardless of the
streamed dtype (bf16 streams under the mixed-precision training policy
shorten only the HBM transfers). Semantics match `layers.gru_step`
(torch GRU: the hidden-side bias sits inside the reset product).

The reference has no equivalent: its torch GRUs lower to cuDNN's fused
RNN kernels on GPU (vocoder/models/fatchord_version.py:102-104); this
kernel is the TPU counterpart of that fusion, for training.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_available() -> bool:
    """Use the fused train-time GRU? env RTVC_FUSED_GRU_TRAIN: 1/0/auto
    (auto = on TPU backends only; CPU keeps the lax.scan reference path
    that the genuine-reference parity oracles pin down)."""
    mode = os.environ.get("RTVC_FUSED_GRU_TRAIN", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(S: int, H: int):
    def kernel(xg_ref, whh_t_ref, bhh_ref, ys_ref, gates_ref, h_scr):
        from jax.experimental import pallas as pl

        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            h_scr[:] = jnp.zeros_like(h_scr)

        def step(s, _):
            xg = xg_ref[s].astype(jnp.float32)          # (Bp, 3H)
            h = h_scr[0].astype(jnp.float32)            # (Bp, H)
            hg = (
                jnp.dot(h, whh_t_ref[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
                + bhh_ref[0].astype(jnp.float32)
            )
            r = jax.nn.sigmoid(xg[:, :H] + hg[:, :H])
            z = jax.nn.sigmoid(xg[:, H:2 * H] + hg[:, H:2 * H])
            hn = hg[:, 2 * H:]
            n = jnp.tanh(xg[:, 2 * H:] + r * hn)
            h_new = (1.0 - z) * n + z * h
            h_scr[0] = h_new.astype(h_scr.dtype)
            ys_ref[s] = h_new.astype(ys_ref.dtype)
            gates_ref[s] = jnp.concatenate([r, z, n, hn], axis=1).astype(
                gates_ref.dtype
            )
            return 0

        jax.lax.fori_loop(0, S, step, 0)

    return kernel


# ---------------------------------------------------------------------------
# Backward kernel (reverse-time dh chain; batch-over-time work hoisted out)
# ---------------------------------------------------------------------------


def _bwd_kernel(S: int, H: int):
    def kernel(dys_ref, gates_ref, hprev_ref, whh_ref, dxg_ref, dh_scr):
        from jax.experimental import pallas as pl

        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            dh_scr[:] = jnp.zeros_like(dh_scr)

        def step(i, _):
            s = S - 1 - i
            g = gates_ref[s].astype(jnp.float32)        # (Bp, 4H)
            r, z = g[:, :H], g[:, H:2 * H]
            n, hn = g[:, 2 * H:3 * H], g[:, 3 * H:]
            h_prev = hprev_ref[s].astype(jnp.float32)
            dh = dys_ref[s].astype(jnp.float32) + dh_scr[0]
            dz = dh * (h_prev - n) * z * (1.0 - z)
            dn = dh * (1.0 - z) * (1.0 - n * n)
            dr = dn * hn * r * (1.0 - r)
            # dxg = grads wrt the pre-activation input gates [r, z, n];
            # dhg (hidden side) differs only in the n slice (· r) and is
            # reconstituted OUTSIDE the kernel for the dW/db reductions.
            dxg_ref[s] = jnp.concatenate([dr, dz, dn], axis=1).astype(
                dxg_ref.dtype
            )
            dhg = jnp.concatenate([dr, dz, dn * r], axis=1)
            dh_scr[0] = dh * z + jnp.dot(
                dhg, whh_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, S, step, 0)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _tile_len() -> int:
    # 32 measured best at the production WaveRNN shape (BENCHMARKS.md
    # round-4 tile sweep: 17.5 steps/s bf16 vs 15.3 at 16)
    return int(os.environ.get("RTVC_GRU_TRAIN_TILE", "32"))


# Streamed windows are double-buffered; cost ≈ 2·S·B·(width sum)·esize.
# The kernel streams the FULL batch per window (no batch grid axis), so
# large sweep batches must fall back to the scan path instead of
# overflowing the ~128 MiB VMEM.
_VMEM_BUDGET = 100 * 1024 * 1024


def _vmem_est(S: int, Bp: int, H: int, esize: int) -> int:
    fwd = 2 * S * Bp * 8 * H * esize            # xg 3H in + ys H, gates 4H out
    bwd = 2 * S * Bp * H * (16 + 5 * esize)     # dys f32, gates+h_prev, dxg f32
    return max(fwd, bwd) + 3 * H * H * esize + 4 * Bp * H


def _pick_tile_len(Bp: int, H: int, esize: int) -> int:
    # halving keeps S | Tp (the caller padded T to a multiple of the
    # starting S), so fwd and bwd independently reach the same choice
    S = _tile_len()
    while _vmem_est(S, Bp, H, esize) > _VMEM_BUDGET and S > 4 and S % 2 == 0:
        S //= 2
    return S


def fused_fits(B: int, H: int, dtype) -> bool:
    """Would the fused kernel fit VMEM at this shape? Evaluated at the
    tile length _pick_tile_len will ACTUALLY choose (an odd env override
    cannot halve, so checking the theoretical minimum S=4 would admit
    shapes the picker can't reach). Callers fall back to lax.scan when
    False."""
    import numpy as np

    Bp = _round_up(B, 16 if dtype == jnp.bfloat16 else 8)
    es = np.dtype(dtype).itemsize
    return _vmem_est(_pick_tile_len(Bp, H, es), Bp, H, es) <= _VMEM_BUDGET


def fused_ok(B: int, H: int, dtype) -> bool:
    """The complete dispatch gate shared by every fused-GRU call site:
    lane-aligned H, kernel enabled for this backend, and the shape fits
    VMEM at the tile the picker will choose."""
    return H % 128 == 0 and fused_available() and fused_fits(B, H, dtype)


def _specs(interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kwargs = {}
    if not interpret:
        # v5e has far more physical VMEM than the 16 MB default scoped
        # limit; raise it so the streamed tiles + residuals fit next to
        # the resident W_hh.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl, pltpu, pltpu.VMEM, kwargs


def _call_fwd(xg_t, w_hh_t, b_hh, *, interpret: bool):
    """xg_t (Tp, Bp, 3H) → (ys (Tp, Bp, H), gates (Tp, Bp, 4H))."""
    Tp, Bp, threeH = xg_t.shape
    H = threeH // 3
    S = _pick_tile_len(Bp, H, xg_t.dtype.itemsize)
    n_tiles = Tp // S
    pl, pltpu, vmem, kwargs = _specs(interpret)
    scratch = [pltpu.VMEM((1, Bp, H), jnp.float32)]

    def stream(width):
        return pl.BlockSpec((S, Bp, width), lambda i: (i, 0, 0),
                            memory_space=vmem)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=vmem)

    ys, gates = pl.pallas_call(
        _fwd_kernel(S, H),
        grid=(n_tiles,),
        in_specs=[stream(3 * H), const(w_hh_t.shape), const((1, 3 * H))],
        out_specs=[stream(H), stream(4 * H)],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, H), xg_t.dtype),
            jax.ShapeDtypeStruct((Tp, Bp, 4 * H), xg_t.dtype),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(xg_t, w_hh_t, b_hh[None, :])
    return ys, gates


def _call_bwd(dys_t, gates, h_prev, w_hh, *, interpret: bool):
    """Reverse-time chain → dxg (Tp, Bp, 3H). w_hh is (3H, H)."""
    Tp, Bp, H = dys_t.shape
    S = _pick_tile_len(Bp, H, gates.dtype.itemsize)
    n_tiles = Tp // S
    pl, pltpu, vmem, kwargs = _specs(interpret)
    scratch = [pltpu.VMEM((1, Bp, H), jnp.float32)]

    def rstream(width):
        return pl.BlockSpec((S, Bp, width), lambda i: (n_tiles - 1 - i, 0, 0),
                            memory_space=vmem)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=vmem)

    dxg = pl.pallas_call(
        _bwd_kernel(S, H),
        grid=(n_tiles,),
        in_specs=[rstream(H), rstream(4 * H), rstream(H), const(w_hh.shape)],
        out_specs=rstream(3 * H),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, 3 * H), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(dys_t, gates, h_prev, w_hh)
    return dxg


# ---------------------------------------------------------------------------
# Public differentiable entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_seq_fused(w_hh_t, b_hh, xg, interpret=False):
    """Fused GRU over precomputed input gates.

    w_hh_t (H, 3H) = torch W_hh transposed; b_hh (3H,); xg (B, T, 3H)
    (input projection + input bias, computed outside). Returns the
    hidden sequence (B, T, H) from a zero initial state — identical
    semantics to `models/wavernn.py:_gru_seq`'s scan.
    """
    ys, _ = _gru_fwd_rule(w_hh_t, b_hh, xg, interpret)
    return ys


def _gru_fwd_rule(w_hh_t, b_hh, xg, interpret):
    B, T, threeH = xg.shape
    H = threeH // 3
    S = _tile_len()
    sub = 16 if xg.dtype == jnp.bfloat16 else 8
    Bp, Tp = _round_up(B, sub), _round_up(T, S)
    xg_t = jnp.zeros((Tp, Bp, threeH), xg.dtype).at[:T, :B].set(
        jnp.swapaxes(xg, 0, 1)
    )
    ys_t, gates = _call_fwd(xg_t, w_hh_t, b_hh, interpret=interpret)
    ys = jnp.swapaxes(ys_t, 0, 1)[:B, :T]
    # residual leaves must be JAX types — dtype markers ride as 0-length
    # slices (b_hh's and xg's dtypes are needed to cast the cotangents)
    return ys, (w_hh_t, ys_t, gates, B, T, b_hh[:0], xg[:0, :0, :0])


def _gru_fwd_vjp(w_hh_t, b_hh, xg, interpret):
    # custom_vjp fwd keeps the primal's argument order; only bwd receives
    # the nondiff args hoisted to the front.
    ys, res = _gru_fwd_rule(w_hh_t, b_hh, xg, interpret)
    return ys, res


def _gru_bwd_vjp(interpret, res, dys):
    w_hh_t, ys_t, gates, B, T, b_mark, x_mark = res
    b_dtype, x_dtype = b_mark.dtype, x_mark.dtype
    Tp, Bp, H = ys_t.shape
    dys_t = jnp.zeros((Tp, Bp, H), jnp.float32).at[:T, :B].set(
        jnp.swapaxes(dys, 0, 1).astype(jnp.float32)
    )
    # h_{t-1} stream: the forward output shifted one step (zero state at 0).
    h_prev = jnp.concatenate([jnp.zeros_like(ys_t[:1]), ys_t[:-1]], axis=0)
    dxg_t = _call_bwd(dys_t, gates, h_prev, jnp.swapaxes(w_hh_t, 0, 1),
                      interpret=interpret)
    # Hidden-side pre-activation grads: the n slice regains its ·r factor.
    r = gates[..., :H].astype(jnp.float32)
    dhg_t = jnp.concatenate(
        [dxg_t[..., :2 * H], dxg_t[..., 2 * H:] * r], axis=-1
    )
    # The batch-over-time reductions run OUTSIDE the sequential kernel —
    # one large parallel einsum each on the MXU.
    dw_hh_t = jnp.einsum(
        "tbh,tbg->hg", h_prev.astype(jnp.float32), dhg_t
    ).astype(w_hh_t.dtype)
    db_hh = jnp.sum(dhg_t, axis=(0, 1)).astype(b_dtype)
    dxg = jnp.swapaxes(dxg_t, 0, 1)[:B, :T].astype(x_dtype)
    return dw_hh_t, db_hh, dxg


gru_seq_fused.defvjp(_gru_fwd_vjp, _gru_bwd_vjp)
