"""Pallas TPU kernel: fused train-time LSTM sequence (forward + VJP).

Counterpart of `gru_train_kernel` for the LSTM stacks (speaker encoder:
3×LSTM-256 over 160 frames × 640 utterances, ref: encoder/model.py:18-23;
ForwardTacotron's BiLSTMs). One kernel launch runs the whole sequence:
`W_hh` stays VMEM-resident, the per-step input projections `xg` (hoisted
outside as one big matmul) stream in per tile, and the (h, c) state lives
in VMEM scratch. The backward pass walks tiles in reverse carrying
(dh, dc); everything batchable over time — `dW_hh = Σ_t h_{t-1}ᵀ dxg_t` —
happens OUTSIDE the kernel as one parallel einsum.

Because the encoder's batch is large (640 utterances), the grid carries a
LEADING batch-tile axis: batch rows are independent recurrences, so each
batch tile re-runs the full time loop with its own scratch state (grid
iterates the trailing time axis innermost). That bounds VMEM per tile at
any batch size.

Unlike the GRU, the LSTM's input- and hidden-side pre-activations are
symmetric (gates = xg_t + h·W_hhᵀ, both biases folded into xg by the
caller — models/layers.py:LSTM), so the backward kernel emits a single
`dxg` stream that serves both the input-side cotangent and the weight
reductions.

Forward residuals: the post-activation gates (i, f, g, o) and the cell
sequence c — the backward kernel re-derives tanh(c) and needs no
recompute matmul in its sequential chain.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_available() -> bool:
    """env RTVC_FUSED_LSTM_TRAIN: 1/0/auto (auto = TPU backends only)."""
    mode = os.environ.get("RTVC_FUSED_LSTM_TRAIN", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _tile_len() -> int:
    return int(os.environ.get("RTVC_LSTM_TRAIN_TILE", "16"))


def _batch_tile() -> int:
    return int(os.environ.get("RTVC_LSTM_TRAIN_BTILE", "128"))


# Streamed windows are double-buffered by Pallas, so VMEM cost is
# 2 · S · Bt · (sum of stream widths) · esize; the encoder's production
# shape (B=640, H=768, f32) overflows the ~128 MiB VMEM at the default
# (16, 128) tiles. Shrink S first (keeps the (Bt, H)·(H, 4H) matmul
# MXU-shaped), then Bt, until the worst of the fwd/bwd estimates fits.
_VMEM_BUDGET = 88 * 1024 * 1024


def _vmem_est(S: int, Bt: int, H: int, esize: int) -> int:
    # fwd streams: xg(4H) in + ys(H), cs(H), gates(4H) out, all esize;
    # bwd streams: dys(H f32), gates(4H), cs(H), cprev(H) in +
    # dxg(4H f32) out. Plus the resident W_hh and the h/c scratch.
    fwd = 2 * S * Bt * 10 * H * esize
    bwd = 2 * S * Bt * H * (20 + 6 * esize)
    return max(fwd, bwd) + 4 * H * H * esize + 4 * Bt * H * 4


def _pick_tiles(Bp: int, H: int, esize: int) -> tuple:
    S, Bt = _tile_len(), min(_batch_tile(), Bp)
    while _vmem_est(S, Bt, H, esize) > _VMEM_BUDGET and S > 4 and S % 2 == 0:
        S //= 2
    while _vmem_est(S, Bt, H, esize) > _VMEM_BUDGET and Bt > 32 \
            and Bt % 2 == 0:
        Bt //= 2
    return S, Bt


def fused_fits(B: int, H: int, dtype) -> bool:
    """Would the fused kernel fit VMEM at the tiles _pick_tiles will
    actually choose? (Both tile axes shrink, so production shapes always
    fit — but a huge H makes the resident W_hh alone exceed the budget,
    and odd env overrides stop the halving early.)"""
    import numpy as np

    es = np.dtype(dtype).itemsize
    Bp = _round_up(B, 16 if dtype == jnp.bfloat16 else 8)
    S, Bt = _pick_tiles(Bp, H, es)
    return _vmem_est(S, Bt, H, es) <= _VMEM_BUDGET


def fused_ok(B: int, H: int, dtype) -> bool:
    """The complete dispatch gate shared by every fused-LSTM call site
    (layers.LSTM, forward_tacotron._lstm_dir): lane-aligned H, kernel
    enabled for this backend, and the shape fits VMEM at the tiles the
    picker will choose."""
    return H % 128 == 0 and fused_available() and fused_fits(B, H, dtype)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(S: int, H: int):
    def kernel(xg_ref, whh_t_ref, h0_ref, c0_ref,
               ys_ref, cs_ref, gates_ref, hT_ref, cT_ref, h_scr, c_scr):
        from jax.experimental import pallas as pl

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            h_scr[:] = h0_ref[:].astype(h_scr.dtype)
            c_scr[:] = c0_ref[:].astype(c_scr.dtype)

        def step(s, _):
            xg = xg_ref[s].astype(jnp.float32)          # (Bt, 4H)
            h = h_scr[0]
            c = c_scr[0]
            gates = xg + jnp.dot(
                h, whh_t_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            h_scr[0] = h
            c_scr[0] = c
            ys_ref[s] = h.astype(ys_ref.dtype)
            cs_ref[s] = c.astype(cs_ref.dtype)
            gates_ref[s] = jnp.concatenate([i, f, g, o], axis=1).astype(
                gates_ref.dtype
            )
            return 0

        jax.lax.fori_loop(0, S, step, 0)
        # constant index_map → the last (time) grid step's write survives
        hT_ref[:] = h_scr[:].astype(hT_ref.dtype)
        cT_ref[:] = c_scr[:].astype(cT_ref.dtype)

    return kernel


def _bwd_kernel(S: int, H: int):
    def kernel(dys_ref, dhT_ref, dcT_ref, gates_ref, cs_ref, cprev_ref,
               whh_ref, dxg_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
        from jax.experimental import pallas as pl

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            dh_scr[:] = dhT_ref[:].astype(jnp.float32)
            dc_scr[:] = dcT_ref[:].astype(jnp.float32)

        def step(k, _):
            s = S - 1 - k
            g4 = gates_ref[s].astype(jnp.float32)
            i, f = g4[:, :H], g4[:, H:2 * H]
            g, o = g4[:, 2 * H:3 * H], g4[:, 3 * H:]
            c = cs_ref[s].astype(jnp.float32)
            c_prev = cprev_ref[s].astype(jnp.float32)
            tanhc = jnp.tanh(c)
            dh = dys_ref[s].astype(jnp.float32) + dh_scr[0]
            do = dh * tanhc * o * (1.0 - o)
            dc = dc_scr[0] + dh * o * (1.0 - tanhc * tanhc)
            di = dc * g * i * (1.0 - i)
            df = dc * c_prev * f * (1.0 - f)
            dg = dc * i * (1.0 - g * g)
            dxg = jnp.concatenate([di, df, dg, do], axis=1)
            dxg_ref[s] = dxg.astype(dxg_ref.dtype)
            dc_scr[0] = dc * f
            dh_scr[0] = jnp.dot(
                dxg, whh_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, S, step, 0)
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]

    return kernel


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _plumbing(interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl, pltpu, pltpu.VMEM, kwargs


def _call_fwd(xg_t, w_hh_t, h0, c0, *, S: int, Bt: int, interpret: bool):
    Tp, Bp, fourH = xg_t.shape
    H = fourH // 4
    nT, nB = Tp // S, Bp // Bt
    pl, pltpu, vmem, kwargs = _plumbing(interpret)
    scratch = [pltpu.VMEM((1, Bt, H), jnp.float32),
               pltpu.VMEM((1, Bt, H), jnp.float32)]

    def stream(width):
        return pl.BlockSpec((S, Bt, width), lambda b, t: (t, b, 0),
                            memory_space=vmem)

    def state(width):
        return pl.BlockSpec((1, Bt, width), lambda b, t: (0, b, 0),
                            memory_space=vmem)

    def const(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=vmem)

    ys, cs, gates, hT, cT = pl.pallas_call(
        _fwd_kernel(S, H),
        grid=(nB, nT),
        in_specs=[stream(4 * H), const(w_hh_t.shape), state(H), state(H)],
        out_specs=[stream(H), stream(H), stream(4 * H), state(H), state(H)],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, H), xg_t.dtype),
            jax.ShapeDtypeStruct((Tp, Bp, H), xg_t.dtype),
            jax.ShapeDtypeStruct((Tp, Bp, 4 * H), xg_t.dtype),
            jax.ShapeDtypeStruct((1, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp, H), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(xg_t, w_hh_t, h0[None], c0[None])
    return ys, cs, gates, hT, cT


def _call_bwd(dys_t, dhT, dcT, gates, cs, c_prev, w_hh, *, S: int, Bt: int,
              interpret: bool):
    Tp, Bp, H = dys_t.shape
    nT, nB = Tp // S, Bp // Bt
    pl, pltpu, vmem, kwargs = _plumbing(interpret)
    scratch = [pltpu.VMEM((1, Bt, H), jnp.float32),
               pltpu.VMEM((1, Bt, H), jnp.float32)]

    def rstream(width):
        return pl.BlockSpec((S, Bt, width), lambda b, t: (nT - 1 - t, b, 0),
                            memory_space=vmem)

    def state(width):
        return pl.BlockSpec((1, Bt, width), lambda b, t: (0, b, 0),
                            memory_space=vmem)

    def const(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=vmem)

    dxg, dh0, dc0 = pl.pallas_call(
        _bwd_kernel(S, H),
        grid=(nB, nT),
        in_specs=[rstream(H), state(H), state(H), rstream(4 * H),
                  rstream(H), rstream(H), const(w_hh.shape)],
        out_specs=[rstream(4 * H), state(H), state(H)],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp, H), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(dys_t, dhT[None], dcT[None], gates, cs, c_prev, w_hh)
    return dxg, dh0[0], dc0[0]


# ---------------------------------------------------------------------------
# Public differentiable entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_seq_fused(w_hh_t, xg, h0, c0, interpret=False):
    """Fused LSTM over precomputed input gates.

    w_hh_t (H, 4H) = torch W_hh transposed; xg (B, T, 4H) = input
    projection with BOTH biases folded in (models/layers.py:LSTM); h0/c0
    (B, H) initial state. Returns (ys (B, T, H), h_T (B, H), c_T (B, H))
    — identical semantics to the lax.scan recurrence.
    """
    out, _ = _lstm_fwd_rule(w_hh_t, xg, h0, c0, interpret)
    return out


def _lstm_fwd_rule(w_hh_t, xg, h0, c0, interpret):
    B, T, fourH = xg.shape
    H = fourH // 4
    sub = 16 if xg.dtype == jnp.bfloat16 else 8
    Bp = _round_up(B, sub)
    S, Bt = _pick_tiles(Bp, H, jnp.dtype(xg.dtype).itemsize)
    # the grid needs Bt | Bp and S | Tp
    Bp, Tp = _round_up(Bp, Bt), _round_up(T, S)
    xg_t = jnp.zeros((Tp, Bp, fourH), xg.dtype).at[:T, :B].set(
        jnp.swapaxes(xg, 0, 1)
    )
    h0p = jnp.zeros((Bp, H), jnp.float32).at[:B].set(h0.astype(jnp.float32))
    c0p = jnp.zeros((Bp, H), jnp.float32).at[:B].set(c0.astype(jnp.float32))
    ys_t, cs, gates, hT, cT = _call_fwd(xg_t, w_hh_t, h0p, c0p, S=S, Bt=Bt,
                                        interpret=interpret)
    ys = jnp.swapaxes(ys_t, 0, 1)[:B, :T]
    # h_T/c_T must be the state at the true T, not the padded end — with
    # zero-padded xg the padded steps still evolve (h, c); read from ys/cs.
    if Tp != T:
        hT_out = ys_t[T - 1, :B].astype(h0.dtype)
        cT_out = cs[T - 1, :B].astype(c0.dtype)
    else:
        hT_out = hT[0, :B].astype(h0.dtype)
        cT_out = cT[0, :B].astype(c0.dtype)
    res = (w_hh_t, ys_t, cs, gates, h0p, c0p, B, T, xg[:0, :0, :0],
           h0[:0], c0[:0])
    return (ys, hT_out, cT_out), res


def _lstm_fwd_vjp(w_hh_t, xg, h0, c0, interpret):
    return _lstm_fwd_rule(w_hh_t, xg, h0, c0, interpret)


def _lstm_bwd_vjp(interpret, res, cot):
    dys, dhT, dcT = cot
    w_hh_t, ys_t, cs, gates, h0p, c0p, B, T, x_mark, h_mark, c_mark = res
    # same deterministic tile choice as the forward (Bp here is already
    # rounded to a Bt multiple, which leaves _pick_tiles' answer unchanged)
    S, Bt = _pick_tiles(ys_t.shape[1], ys_t.shape[2],
                        jnp.dtype(gates.dtype).itemsize)
    Tp, Bp, H = ys_t.shape
    dys_t = jnp.zeros((Tp, Bp, H), jnp.float32).at[:T, :B].set(
        jnp.swapaxes(dys, 0, 1).astype(jnp.float32)
    )
    dhT_p = jnp.zeros((Bp, H), jnp.float32)
    dcT_p = jnp.zeros((Bp, H), jnp.float32).at[:B].set(
        dcT.astype(jnp.float32)
    )
    if Tp == T:
        dhT_p = dhT_p.at[:B].set(dhT.astype(jnp.float32))
    else:
        # Padded tail: neutralize the pad steps so the backward carries
        # cross them untouched — overwrite their gate residuals with
        # (i=0, f=1, g=0, o=0): then dxg = 0 (no spurious weight grads),
        # dc_carry·f = dc_carry survives, and dh_carry = dxg·W would die —
        # so dhT instead rides the t = T-1 dys slot, which the kernel adds
        # exactly where the carry would have delivered it.
        pad_gates = jnp.zeros((1, 1, 4 * H), gates.dtype).at[
            0, 0, H:2 * H].set(jnp.ones((H,), gates.dtype))
        gates = gates.at[T:].set(
            jnp.broadcast_to(pad_gates, (Tp - T, Bp, 4 * H)))
        dys_t = dys_t.at[T - 1, :B].add(dhT.astype(jnp.float32))
    c_prev = jnp.concatenate([c0p[None].astype(cs.dtype), cs[:-1]], axis=0)
    dxg_t, dh0, dc0 = _call_bwd(dys_t, dhT_p, dcT_p, gates, cs, c_prev,
                                jnp.swapaxes(w_hh_t, 0, 1), S=S, Bt=Bt,
                                interpret=interpret)
    h_prev = jnp.concatenate(
        [h0p[None].astype(ys_t.dtype), ys_t[:-1]], axis=0
    ).astype(jnp.float32)
    dw_hh_t = jnp.einsum("tbh,tbg->hg", h_prev, dxg_t).astype(w_hh_t.dtype)
    dxg = jnp.swapaxes(dxg_t, 0, 1)[:B, :T].astype(x_mark.dtype)
    return (dw_hh_t, dxg, dh0[:B].astype(h_mark.dtype),
            dc0[:B].astype(c_mark.dtype))


lstm_seq_fused.defvjp(_lstm_fwd_vjp, _lstm_bwd_vjp)
