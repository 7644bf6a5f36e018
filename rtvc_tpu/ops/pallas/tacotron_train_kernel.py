"""Pallas TPU kernel: fused TRAIN-mode Tacotron decoder (forward + VJP).

Round 4 hoisted everything state-independent out of the teacher-forced
decoder scan (models/tacotron.py:tacotron_forward), leaving the truly
serial chain — attention GRU → location-sensitive attention → 2× zoneout
LSTM — as an XLA ``lax.scan`` of dependent small matmuls. That chain is
what bounds synthesizer training (the round-4 batch-scaling curves: MFU
climbs with batch while HBM plateaus → serial-chain bound, BENCHMARKS.md).
This kernel runs the whole chain in ONE ``pallas_call``: every decoder
weight stays VMEM-resident across all steps, per-step inputs (the hoisted
attention-GRU projection, zoneout masks) stream in per time tile, and the
recurrent state lives in VMEM scratch — the same recipe that won 1.58× on
the WaveRNN GRU (`gru_train_kernel`) and 1.80× on the encoder LSTM
(`lstm_train_kernel`), applied to the one recurrence it hadn't reached.

Differences from the generate-side kernel (`tacotron_kernel`):

  * teacher-forced: fixed iteration count, no stop-token early exit, no
    prenet (hoisted outside — its inputs are fully known under teacher
    forcing) and no mel/stop projections (applied to the stacked states
    outside as one big matmul each);
  * the LSA location term is a **windows matmul** instead of the generate
    kernel's banded matrix: ``ploc = windows(cum) @ mloc`` with
    ``windows`` the (B·T, 32) tap-window view of the cumulative scores —
    (B·T, 32) @ (32, D) is MXU-shaped at train batch sizes and needs no
    (T, T·D) band resident in VMEM (the backward would need the band's
    transpose too — 2× the budget);
  * a full custom VJP: the backward kernel walks time tiles in reverse
    carrying 7 cotangent states, re-derives everything cheap (tanh terms,
    cum via reverse subtraction of the stored scores) and streams out the
    per-step cotangents that the weight-gradient einsums (batched over
    time, OUTSIDE the kernel) consume;
  * zoneout masks are drawn OUTSIDE with ``jax.random.bernoulli`` and
    streamed in, so forward and backward see bitwise-identical masks and
    the fused path keeps the scan path's exact regularization semantics.

Shapes must satisfy D % 128 == L % 128 == E % 128 == 0 (true for the
production and quality-tier configs); T pads to 128 with a −1e30 additive
mask next to the reference's multiplicative char mask (ref:
synthesizer/models/tacotron.py:208). Gradient parity vs the XLA scan path
is pinned by tests/test_taco_train_kernel.py.

Ref: synthesizer/models/tacotron.py:244-299 (decoder chain), :179-216
(LSA); the hoisting contract is models/tacotron.py:tacotron_forward.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

_KW = 32  # LSA tap-window width (31 taps + 1 zero pad)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_available() -> bool:
    """env RTVC_FUSED_TACO_TRAIN: 1/0/auto.

    auto = OFF (measured kill, BENCHMARKS.md round-5 lever table): at the
    production shape (112×896, r=7, bf16) the backward's attention-memory
    tiles ((Bt, T, E) enc_seq/denc_seq) force a batch tile of 8 to fit
    VMEM, which serializes 14 batch tiles through the recurrence —
    4.92 steps/s vs the hoisted scan's 9.38 (0.52×). The kernel stays
    correct (grads parity-tested, identical first loss on-chip) and wins
    at small dims where the whole batch fits one tile; force with =1."""
    mode = os.environ.get("RTVC_FUSED_TACO_TRAIN", "auto")
    return mode == "1"


def fused_ok(d, E: int) -> bool:
    """Dims the kernel supports without gate-block repadding (the LSA conv
    width is architecturally fixed at 31, ref tacotron.py:188)."""
    return (
        d.decoder_dims % 128 == 0
        and d.lstm_dims % 128 == 0
        and E % 128 == 0
        and fused_available()
    )


def _env_interpret() -> bool:
    """RTVC_TACO_TRAIN_INTERPRET=1: run the kernels in interpret mode
    (CPU tests of the integrated tacotron_forward fused branch)."""
    return os.environ.get("RTVC_TACO_TRAIN_INTERPRET") == "1"


def _tile_len() -> int:
    return int(os.environ.get("RTVC_TACO_TRAIN_TILE", "4"))


def _batch_tile() -> int:
    # 16 keeps the backward's per-batch-tile VMEM accumulators
    # (denc_seq/denc_proj, (Bt, Tp, E/D) f32) inside the budget at the
    # production point (B=112, T_text=160 → Tp=256, E=1024).
    return int(os.environ.get("RTVC_TACO_TRAIN_BTILE", "16"))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(S: int, D: int, L: int, E: int, Tp: int):
    def kernel(
        # streams in
        xg_ref, zo1_ref, zo2_ref,
        # resident
        enc_seq, enc_proj, mmask, amask,
        gwh, gbh, wq, bq, mloc, vv, wri, bri,
        l1wi, l1wh, l1b, l2wi, l2wh, l2b, gwi_ctx,
        # streams out
        ah_ref, g4_ref, x0_ref, gates1_ref, c1_ref, h1_ref,
        gates2_ref, c2_ref, h2_ref, scores_ref, ctx_ref, cumT_ref,
        # scratch
        ah_s, r1h_s, r1c_s, r2h_s, r2c_s, ctx_s, cum_s,
    ):
        from jax.experimental import pallas as pl

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            ah_s[:] = jnp.zeros_like(ah_s)
            r1h_s[:] = jnp.zeros_like(r1h_s)
            r1c_s[:] = jnp.zeros_like(r1c_s)
            r2h_s[:] = jnp.zeros_like(r2h_s)
            r2c_s[:] = jnp.zeros_like(r2c_s)
            ctx_s[:] = jnp.zeros_like(ctx_s)
            cum_s[:] = jnp.zeros_like(cum_s)

        def mm(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        Bt = ah_s.shape[1]

        def step(s, _):
            # --- attention GRU (torch gate order r|z|n; b_hn inside the
            # reset product — ref nn.GRUCell semantics) ----------------
            xg = xg_ref[s].astype(jnp.float32) + mm(ctx_s[0], gwi_ctx[:])
            hg = mm(ah_s[0], gwh[:]) + gbh[0]
            r = jax.nn.sigmoid(xg[:, :D] + hg[:, :D])
            z = jax.nn.sigmoid(xg[:, D:2 * D] + hg[:, D:2 * D])
            hn = hg[:, 2 * D:]
            n = jnp.tanh(xg[:, 2 * D:] + r * hn)
            ah = (1.0 - z) * n + z * ah_s[0]
            ah_s[0] = ah
            ah_ref[s] = ah
            g4_ref[s] = jnp.concatenate([r, z, n, hn], axis=1)

            # --- LSA: shifted-tap location term + query + memory ------
            # Score-shaped tensors (cum/scores/masks) live in a
            # (Bt, Tp, 1) layout — T on SUBLANES, unit lane — so each of
            # the 31 taps is a sublane slice + lane broadcast and the
            # softmax is a sublane reduction. Mosaic has no lane↔sublane
            # relayout, so the (Bt, Tp)-lane formulation (broadcasting
            # cum slices over D) cannot lower; this one never transposes.
            # ploc[b, t, :] = Σ_k cum[b, t + k − 15] · mloc[k, :]
            q = mm(ah, wq[:]) + bq[0]
            cum = cum_s[0]  # (Bt, Tp, 1)
            zpad = jnp.zeros((Bt, 16, 1), jnp.float32)
            cp = jnp.concatenate([zpad, cum, zpad], axis=1)
            ploc = jnp.zeros((Bt, Tp, D), jnp.float32)
            for k in range(31):
                ploc += cp[:, k + 1:k + 1 + Tp, :] \
                    * mloc[k][None, None, :]
            tv = jnp.tanh(q[:, None, :] + enc_proj[0] + ploc)
            u = jnp.sum(tv * vv[0][None, None, :], axis=2, keepdims=True)
            u = u * mmask[0] + amask[0]
            mx = jnp.max(u, axis=1, keepdims=True)
            e = jnp.exp(u - mx)
            scores = e / jnp.sum(e, axis=1, keepdims=True)  # (Bt, Tp, 1)
            cum_s[0] = cum + scores
            scores_ref[s] = scores
            ctx = jnp.sum(scores * enc_seq[0], axis=1)
            ctx_s[0] = ctx
            ctx_ref[s] = ctx

            # --- rnn_input + 2× residual zoneout LSTM -----------------
            x0 = mm(jnp.concatenate([ctx, ah], axis=1), wri[:]) + bri[0]
            x0_ref[s] = x0

            def lstm(x, h_prev, c_prev, wi, wh, b, zo):
                g = mm(x, wi[:]) + mm(h_prev, wh[:]) + b[0]
                i = jax.nn.sigmoid(g[:, :L])
                f = jax.nn.sigmoid(g[:, L:2 * L])
                gg = jnp.tanh(g[:, 2 * L:3 * L])
                o = jax.nn.sigmoid(g[:, 3 * L:])
                c = f * c_prev + i * gg
                hn_ = o * jnp.tanh(c)
                h = zo * h_prev + (1.0 - zo) * hn_
                return h, c, jnp.concatenate([i, f, gg, o], axis=1)

            zo1 = zo1_ref[s].astype(jnp.float32)
            h1, c1, g1 = lstm(x0, r1h_s[0], r1c_s[0], l1wi, l1wh, l1b, zo1)
            r1h_s[0] = h1
            r1c_s[0] = c1
            gates1_ref[s] = g1
            c1_ref[s] = c1
            h1_ref[s] = h1
            x1 = x0 + h1

            zo2 = zo2_ref[s].astype(jnp.float32)
            h2, c2, g2 = lstm(x1, r2h_s[0], r2c_s[0], l2wi, l2wh, l2b, zo2)
            r2h_s[0] = h2
            r2c_s[0] = c2
            gates2_ref[s] = g2
            c2_ref[s] = c2
            h2_ref[s] = h2
            return 0

        jax.lax.fori_loop(0, S, step, 0)
        cumT_ref[:] = cum_s[:]

    return kernel


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(S: int, D: int, L: int, E: int, Tp: int):
    def kernel(
        # streams in (reverse tiles)
        dx2_ref, dctx_ext_ref, dsc_ext_ref,
        ah_ref, ahp_ref, g4_ref, gates1_ref, c1_ref, c1p_ref,
        gates2_ref, c2_ref, c2p_ref, scores_ref, zo1_ref, zo2_ref,
        # state in
        cumT_ref,
        # resident
        enc_seq, enc_proj, mmask, wq_t, gwh_t, gwi_ctx_t,
        wri_t, l1wi_t, l1wh_t, l2wi_t, l2wh_t, wq, bq, mloc, vv,
        # streams out
        dxg_ref, dq_ref, dx0_ref, dgates1_ref, dgates2_ref,
        # accumulated outputs (per batch tile)
        denc_seq_ref, denc_proj_ref, dv_ref, dmloc_ref,
        # scratch
        dah_s, dh1_s, dc1_s, dh2_s, dc2_s, dctx_s, dcum_s, cum_s,
    ):
        from jax.experimental import pallas as pl

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            dah_s[:] = jnp.zeros_like(dah_s)
            dh1_s[:] = jnp.zeros_like(dh1_s)
            dc1_s[:] = jnp.zeros_like(dc1_s)
            dh2_s[:] = jnp.zeros_like(dh2_s)
            dc2_s[:] = jnp.zeros_like(dc2_s)
            dctx_s[:] = jnp.zeros_like(dctx_s)
            dcum_s[:] = jnp.zeros_like(dcum_s)
            cum_s[:] = cumT_ref[:]
            denc_seq_ref[:] = jnp.zeros_like(denc_seq_ref)
            denc_proj_ref[:] = jnp.zeros_like(denc_proj_ref)
            dv_ref[:] = jnp.zeros_like(dv_ref)
            dmloc_ref[:] = jnp.zeros_like(dmloc_ref)

        def mm(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        Bt = dah_s.shape[1]

        def step(k, _):
            s = S - 1 - k

            # --- residual LSTM 2 --------------------------------------
            dx2 = dx2_ref[s].astype(jnp.float32)
            dh2_tot = dx2 + dh2_s[0]
            zo2 = zo2_ref[s].astype(jnp.float32)
            g2 = gates2_ref[s].astype(jnp.float32)
            i2, f2 = g2[:, :L], g2[:, L:2 * L]
            gg2, o2 = g2[:, 2 * L:3 * L], g2[:, 3 * L:]
            c2 = c2_ref[s].astype(jnp.float32)
            c2p = c2p_ref[s].astype(jnp.float32)
            tanh_c2 = jnp.tanh(c2)
            dh2n = dh2_tot * (1.0 - zo2)
            do2 = dh2n * tanh_c2 * o2 * (1.0 - o2)
            dc2 = dc2_s[0] + dh2n * o2 * (1.0 - tanh_c2 * tanh_c2)
            di2 = dc2 * gg2 * i2 * (1.0 - i2)
            df2 = dc2 * c2p * f2 * (1.0 - f2)
            dg2 = dc2 * i2 * (1.0 - gg2 * gg2)
            dgates2 = jnp.concatenate([di2, df2, dg2, do2], axis=1)
            dgates2_ref[s] = dgates2
            dc2_s[0] = dc2 * f2
            dh2_s[0] = dh2_tot * zo2 + mm(dgates2, l2wh_t[:])
            dx1 = dx2 + mm(dgates2, l2wi_t[:])

            # --- residual LSTM 1 --------------------------------------
            dh1_tot = dx1 + dh1_s[0]
            zo1 = zo1_ref[s].astype(jnp.float32)
            g1 = gates1_ref[s].astype(jnp.float32)
            i1, f1 = g1[:, :L], g1[:, L:2 * L]
            gg1, o1 = g1[:, 2 * L:3 * L], g1[:, 3 * L:]
            c1 = c1_ref[s].astype(jnp.float32)
            c1p = c1p_ref[s].astype(jnp.float32)
            tanh_c1 = jnp.tanh(c1)
            dh1n = dh1_tot * (1.0 - zo1)
            do1 = dh1n * tanh_c1 * o1 * (1.0 - o1)
            dc1 = dc1_s[0] + dh1n * o1 * (1.0 - tanh_c1 * tanh_c1)
            di1 = dc1 * gg1 * i1 * (1.0 - i1)
            df1 = dc1 * c1p * f1 * (1.0 - f1)
            dg1 = dc1 * i1 * (1.0 - gg1 * gg1)
            dgates1 = jnp.concatenate([di1, df1, dg1, do1], axis=1)
            dgates1_ref[s] = dgates1
            dc1_s[0] = dc1 * f1
            dh1_s[0] = dh1_tot * zo1 + mm(dgates1, l1wh_t[:])
            dx0 = dx1 + mm(dgates1, l1wi_t[:])
            dx0_ref[s] = dx0

            # --- rnn_input --------------------------------------------
            dcat = mm(dx0, wri_t[:])  # (Bt, E + D)
            dctx_all = dctx_ext_ref[s].astype(jnp.float32) + dctx_s[0] \
                + dcat[:, :E]
            dah_tot = dah_s[0] + dcat[:, E:]

            # --- attention --------------------------------------------
            # Same (Bt, Tp, 1) sublane layout for score-shaped tensors
            # as the forward (Mosaic cannot relayout lanes↔sublanes).
            scores = scores_ref[s].astype(jnp.float32)  # (Bt, Tp, 1)
            denc_seq_ref[0] += scores * dctx_all[:, None, :]
            dscores = dsc_ext_ref[s].astype(jnp.float32) + dcum_s[0] \
                + jnp.sum(dctx_all[:, None, :] * enc_seq[0], axis=2,
                          keepdims=True)
            # softmax VJP, then the reference's multiplicative char mask
            du = scores * (
                dscores - jnp.sum(dscores * scores, axis=1, keepdims=True)
            )
            du = du * mmask[0]

            # recompute tv (cheap; cum_prev via reverse walk of the
            # stored scores)
            cum_prev = cum_s[0] - scores
            cum_s[0] = cum_prev
            ah = ah_ref[s].astype(jnp.float32)
            q = mm(ah, wq[:]) + bq[0]
            zpad = jnp.zeros((Bt, 16, 1), jnp.float32)
            cp = jnp.concatenate([zpad, cum_prev, zpad], axis=1)
            ploc = jnp.zeros((Bt, Tp, D), jnp.float32)
            for k in range(31):
                ploc += cp[:, k + 1:k + 1 + Tp, :] \
                    * mloc[k][None, None, :]
            tv = jnp.tanh(q[:, None, :] + enc_proj[0] + ploc)
            dv_ref[0, 0:1] += jnp.sum(du * tv, axis=(0, 1))[None]
            darg = du * vv[0][None, None, :] * (1.0 - tv * tv)
            denc_proj_ref[0] += darg
            dq = jnp.sum(darg, axis=1)
            dq_ref[s] = dq
            # conv adjoints, unrolled over the 31 taps (VPU reductions):
            #   dmloc[k, :] += Σ_{b,t} cum_prev[b, t+k−15] · darg[b, t, :]
            #   dcum_prev[b, τ] += Σ_k s_k[b, τ+15−k]
            # Scatter-free (Mosaic has no scatter-add lowering): each s_k
            # is zero-extended by concatenation — like cp — and the shift
            # becomes a static sublane-slice READ of that value.
            dcum_acc = jnp.zeros((Bt, Tp, 1), jnp.float32)
            for k in range(31):
                dmloc_ref[0, k:k + 1] += jnp.sum(
                    cp[:, k + 1:k + 1 + Tp, :] * darg, axis=(0, 1)
                )[None]
                s_k = jnp.sum(darg * mloc[k][None, None, :], axis=2,
                              keepdims=True)
                s_pad = jnp.concatenate([zpad, s_k, zpad], axis=1)
                dcum_acc = dcum_acc + s_pad[:, 31 - k:31 - k + Tp, :]
            dcum_prev = dcum_s[0] + dcum_acc
            dcum_s[0] = dcum_prev

            # --- attention GRU ----------------------------------------
            dah_tot = dah_tot + mm(dq, wq_t[:])
            g4 = g4_ref[s].astype(jnp.float32)
            r, z = g4[:, :D], g4[:, D:2 * D]
            n, hn = g4[:, 2 * D:3 * D], g4[:, 3 * D:]
            ahp = ahp_ref[s].astype(jnp.float32)
            dz = dah_tot * (ahp - n) * z * (1.0 - z)
            dn = dah_tot * (1.0 - z) * (1.0 - n * n)
            dr = dn * hn * r * (1.0 - r)
            dxg = jnp.concatenate([dr, dz, dn, dn * r], axis=1)
            dxg_ref[s] = dxg
            dhg = jnp.concatenate([dr, dz, dn * r], axis=1)
            dah_s[0] = dah_tot * z + mm(dhg, gwh_t[:])
            dctx_s[0] = mm(dxg[:, :3 * D], gwi_ctx_t[:])
            return 0

        jax.lax.fori_loop(0, S, step, 0)

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
            vmem_limit_bytes=120 * 1024 * 1024
        )
    return pl, pltpu, pltpu.VMEM, kwargs


def _specs(pl, vmem, S, Bt, nT):
    def stream(width):
        return pl.BlockSpec((S, Bt, width), lambda b, t: (t, b, 0),
                            memory_space=vmem)

    def rstream(width):
        return pl.BlockSpec((S, Bt, width), lambda b, t: (nT - 1 - t, b, 0),
                            memory_space=vmem)

    def tile3(width):
        return pl.BlockSpec((1, Bt, width), lambda b, t: (0, b, 0),
                            memory_space=vmem)

    # score-shaped (…, Tp, 1) variants — T on sublanes, unit lane (the
    # layout the kernels keep cum/scores/masks in; see _fwd_kernel)
    def stream4(width):
        return pl.BlockSpec((S, Bt, width, 1), lambda b, t: (t, b, 0, 0),
                            memory_space=vmem)

    def rstream4(width):
        return pl.BlockSpec((S, Bt, width, 1),
                            lambda b, t: (nT - 1 - t, b, 0, 0),
                            memory_space=vmem)

    def tile4(width):
        return pl.BlockSpec((1, Bt, width, 1), lambda b, t: (0, b, 0, 0),
                            memory_space=vmem)

    def const(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=vmem)

    return stream, rstream, tile3, stream4, rstream4, tile4, const


@functools.partial(
    jax.jit, static_argnames=("S", "Bt", "D", "L", "E", "Tp", "interpret")
)
def _call_fwd(xg, zo1, zo2, enc_seq, enc_proj, mmask, amask, weights,
              S, Bt, D, L, E, Tp, interpret):
    (gwh, gbh, wq, bq, mloc, vv, wri, bri,
     l1wi, l1wh, l1b, l2wi, l2wh, l2b, gwi_ctx) = weights
    Np, Bp, _ = xg.shape
    nT, nB = Np // S, Bp // Bt
    pl, pltpu, vmem, kwargs = _plumbing(interpret)
    stream, _, tile3, stream4, _, tile4, const = _specs(pl, vmem, S, Bt, nT)

    scratch = [
        pltpu.VMEM((1, Bt, D), jnp.float32),        # ah
        pltpu.VMEM((1, Bt, L), jnp.float32),        # r1h
        pltpu.VMEM((1, Bt, L), jnp.float32),        # r1c
        pltpu.VMEM((1, Bt, L), jnp.float32),        # r2h
        pltpu.VMEM((1, Bt, L), jnp.float32),        # r2c
        pltpu.VMEM((1, Bt, E), jnp.float32),        # ctx
        pltpu.VMEM((1, Bt, Tp, 1), jnp.float32),    # cum
    ]
    outs = pl.pallas_call(
        _fwd_kernel(S, D, L, E, Tp),
        grid=(nB, nT),
        in_specs=[stream(3 * D), stream(L), stream(L),
                  pl.BlockSpec((1, Bt, Tp, E), lambda b, t: (0, b, 0, 0),
                               memory_space=vmem),
                  pl.BlockSpec((1, Bt, Tp, D), lambda b, t: (0, b, 0, 0),
                               memory_space=vmem),
                  tile4(Tp), tile4(Tp),
                  *[const(w.shape) for w in weights]],
        out_specs=[stream(D), stream(4 * D), stream(L), stream(4 * L),
                   stream(L), stream(L), stream(4 * L), stream(L),
                   stream(L), stream4(Tp), stream(E), tile4(Tp)],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Bp, D), jnp.float32),      # ah
            jax.ShapeDtypeStruct((Np, Bp, 4 * D), jnp.float32),  # g4
            jax.ShapeDtypeStruct((Np, Bp, L), jnp.float32),      # x0
            jax.ShapeDtypeStruct((Np, Bp, 4 * L), jnp.float32),  # gates1
            jax.ShapeDtypeStruct((Np, Bp, L), jnp.float32),      # c1
            jax.ShapeDtypeStruct((Np, Bp, L), jnp.float32),      # h1
            jax.ShapeDtypeStruct((Np, Bp, 4 * L), jnp.float32),  # gates2
            jax.ShapeDtypeStruct((Np, Bp, L), jnp.float32),      # c2
            jax.ShapeDtypeStruct((Np, Bp, L), jnp.float32),      # h2
            jax.ShapeDtypeStruct((Np, Bp, Tp, 1), jnp.float32),  # scores
            jax.ShapeDtypeStruct((Np, Bp, E), jnp.float32),      # ctx
            jax.ShapeDtypeStruct((1, Bp, Tp, 1), jnp.float32),   # cum_T
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(xg, zo1, zo2, enc_seq[None], enc_proj[None], mmask[None],
      amask[None], *weights)
    return outs


@functools.partial(
    jax.jit, static_argnames=("S", "Bt", "D", "L", "E", "Tp", "interpret")
)
def _call_bwd(dx2, dctx_ext, dsc_ext, res_streams, cumT,
              enc_seq, enc_proj, mmask, weights_b,
              S, Bt, D, L, E, Tp, interpret):
    (ah, ahp, g4, gates1, c1, c1p, gates2, c2, c2p, scores,
     zo1, zo2) = res_streams
    (wq_t, gwh_t, gwi_ctx_t, wri_t, l1wi_t, l1wh_t, l2wi_t,
     l2wh_t, wq, bq, mloc, vv) = weights_b
    Np, Bp, _ = dx2.shape
    nT, nB = Np // S, Bp // Bt
    pl, pltpu, vmem, kwargs = _plumbing(interpret)
    (_, rstream, tile3, _, rstream4, tile4, const) = _specs(
        pl, vmem, S, Bt, nT)

    scratch = [
        pltpu.VMEM((1, Bt, D), jnp.float32),        # dah
        pltpu.VMEM((1, Bt, L), jnp.float32),        # dh1
        pltpu.VMEM((1, Bt, L), jnp.float32),        # dc1
        pltpu.VMEM((1, Bt, L), jnp.float32),        # dh2
        pltpu.VMEM((1, Bt, L), jnp.float32),        # dc2
        pltpu.VMEM((1, Bt, E), jnp.float32),        # dctx
        pltpu.VMEM((1, Bt, Tp, 1), jnp.float32),    # dcum
        pltpu.VMEM((1, Bt, Tp, 1), jnp.float32),    # cum reconstruct
    ]
    enc4 = pl.BlockSpec((1, Bt, Tp, E), lambda b, t: (0, b, 0, 0),
                        memory_space=vmem)
    encp4 = pl.BlockSpec((1, Bt, Tp, D), lambda b, t: (0, b, 0, 0),
                         memory_space=vmem)
    outs = pl.pallas_call(
        _bwd_kernel(S, D, L, E, Tp),
        grid=(nB, nT),
        in_specs=[rstream(L), rstream(E), rstream4(Tp),
                  rstream(D), rstream(D), rstream(4 * D), rstream(4 * L),
                  rstream(L), rstream(L), rstream(4 * L), rstream(L),
                  rstream(L), rstream4(Tp), rstream(L), rstream(L),
                  tile4(Tp),
                  enc4, encp4, tile4(Tp),
                  *[const(w.shape) for w in weights_b]],
        out_specs=[rstream(4 * D), rstream(D), rstream(L), rstream(4 * L),
                   rstream(4 * L),
                   pl.BlockSpec((1, Bt, Tp, E), lambda b, t: (0, b, 0, 0),
                                memory_space=vmem),
                   pl.BlockSpec((1, Bt, Tp, D), lambda b, t: (0, b, 0, 0),
                                memory_space=vmem),
                   pl.BlockSpec((1, 8, D), lambda b, t: (b, 0, 0),
                                memory_space=vmem),
                   pl.BlockSpec((1, _KW, D), lambda b, t: (b, 0, 0),
                                memory_space=vmem)],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Bp, 4 * D), jnp.float32),  # dxg4
            jax.ShapeDtypeStruct((Np, Bp, D), jnp.float32),      # dq
            jax.ShapeDtypeStruct((Np, Bp, L), jnp.float32),      # dx0
            jax.ShapeDtypeStruct((Np, Bp, 4 * L), jnp.float32),  # dgates1
            jax.ShapeDtypeStruct((Np, Bp, 4 * L), jnp.float32),  # dgates2
            jax.ShapeDtypeStruct((1, Bp, Tp, E), jnp.float32),   # denc_seq
            jax.ShapeDtypeStruct((1, Bp, Tp, D), jnp.float32),   # denc_proj
            jax.ShapeDtypeStruct((nB, 8, D), jnp.float32),       # dv
            jax.ShapeDtypeStruct((nB, _KW, D), jnp.float32),     # dmloc
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(dx2, dctx_ext, dsc_ext, ah, ahp, g4, gates1, c1, c1p, gates2, c2,
      c2p, scores, zo1, zo2, cumT[None],
      enc_seq[None], enc_proj[None], mmask[None], *weights_b)
    return outs


# ---------------------------------------------------------------------------
# Public differentiable entry point
# ---------------------------------------------------------------------------


def _pad_tb(x, Np, Bp):
    """(n, B, W) → (Np, Bp, W) zero-padded."""
    n, B, W = x.shape
    return jnp.zeros((Np, Bp, W), x.dtype).at[:n, :B].set(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def taco_decoder_train_fused(weights, xg_pre, enc_seq, enc_proj, char_mask,
                             amask, zo1, zo2, interpret=False):
    """Fused teacher-forced decoder chain.

    weights: tuple of prepared tensors (see ``prepare_train_weights``);
    xg_pre (n_iters, B, 3D): hoisted attention-GRU input projection
    (prenet half + bias_ih, models/tacotron.py hoisted path);
    enc_seq (B, T, E) / enc_proj (B, T, D) / char_mask (B, T) from
    ``encode``; amask (B, T) additive column mask (−1e30 at pads);
    zo1/zo2 (n_iters, B, L) zoneout keep-previous masks in {0., 1.}
    (all-zeros = no zoneout, eval semantics).

    Returns (x_all (n_iters, B, L), ctx_all (n_iters, B, E),
    scores_all (n_iters, B, T)) — identical semantics to the hoisted scan
    body in ``tacotron_forward`` (up to f32 summation order).
    """
    out, _ = _fwd_rule(weights, xg_pre, enc_seq, enc_proj, char_mask,
                       amask, zo1, zo2, interpret)
    return out


def _dims_of(weights):
    gwh = weights[0]
    wri = weights[6]
    D = gwh.shape[0]
    L = wri.shape[1]
    E = wri.shape[0] - D
    return D, L, E


def _fwd_rule(weights, xg_pre, enc_seq, enc_proj, char_mask, amask,
              zo1, zo2, interpret):
    interpret = interpret or _env_interpret()
    D, L, E = _dims_of(weights)
    n, B, _ = xg_pre.shape
    T = enc_seq.shape[1]
    Tp = _round_up(T, 128)
    S = _tile_len()
    Bt = min(_batch_tile(), _round_up(B, 8))
    Np = _round_up(n, S)
    Bp = _round_up(_round_up(B, 8), Bt)

    xg = _pad_tb(xg_pre.astype(jnp.float32), Np, Bp)
    z1 = _pad_tb(zo1.astype(jnp.float32), Np, Bp)
    z2 = _pad_tb(zo2.astype(jnp.float32), Np, Bp)
    es = jnp.zeros((Bp, Tp, E), jnp.float32).at[:B, :T].set(
        enc_seq.astype(jnp.float32))
    ep = jnp.zeros((Bp, Tp, D), jnp.float32).at[:B, :T].set(
        enc_proj.astype(jnp.float32))
    # score-shaped tensors travel in the kernels' (…, Tp, 1) layout
    mm_ = jnp.zeros((Bp, Tp), jnp.float32).at[:B, :T].set(
        char_mask.astype(jnp.float32))[..., None]
    am = jnp.full((Bp, Tp), -1e30, jnp.float32).at[:B, :T].set(
        amask.astype(jnp.float32))[..., None]

    outs = _call_fwd(xg, z1, z2, es, ep, mm_, am, weights,
                     S=S, Bt=Bt, D=D, L=L, E=E, Tp=Tp, interpret=interpret)
    (ah, g4, x0, gates1, c1, h1, gates2, c2, h2, scores, ctx, cumT) = outs
    x_all = (x0 + h1 + h2)[:n, :B]
    ctx_all = ctx[:n, :B]
    scores_all = scores[:n, :B, :T, 0]
    res = (weights, xg, z1, z2, es, ep, mm_, ah, g4, x0, gates1, c1, h1,
           gates2, c2, h2, scores, ctx, cumT, n, B, T,
           xg_pre[:0, :0, :0], enc_seq[:0, :0, :0])
    return (x_all, ctx_all, scores_all), res


def _fwd_vjp(weights, xg_pre, enc_seq, enc_proj, char_mask, amask, zo1,
             zo2, interpret):
    return _fwd_rule(weights, xg_pre, enc_seq, enc_proj, char_mask, amask,
                     zo1, zo2, interpret)


def _bwd_vjp(interpret, res, cot):
    interpret = interpret or _env_interpret()
    dx_all, dctx_all, dscores_all = cot
    (weights, xg, z1, z2, es, ep, mm_, ah, g4, x0, gates1, c1, h1,
     gates2, c2, h2, scores, ctx, cumT, n, B, T, xg_mark, enc_mark) = res
    xg_dt, enc_dt = xg_mark.dtype, enc_mark.dtype
    (gwh, gbh, wq, bq, mloc, vv, wri, bri,
     l1wi, l1wh, l1b, l2wi, l2wh, l2b, gwi_ctx) = weights
    D, L, E = _dims_of(weights)
    Np, Bp, _ = ah.shape
    Tp = es.shape[1]
    S = _tile_len()
    Bt = min(_batch_tile(), Bp)

    dx2 = _pad_tb(dx_all.astype(jnp.float32), Np, Bp)
    dce = _pad_tb(dctx_all.astype(jnp.float32), Np, Bp)
    dse = jnp.zeros((Np, Bp, Tp), jnp.float32).at[:n, :B, :T].set(
        dscores_all.astype(jnp.float32))[..., None]

    zeros_row = jnp.zeros((1, Bp, ah.shape[2]), jnp.float32)
    ahp = jnp.concatenate([zeros_row, ah[:-1]], axis=0)
    zl = jnp.zeros((1, Bp, L), jnp.float32)
    c1p = jnp.concatenate([zl, c1[:-1]], axis=0)
    c2p = jnp.concatenate([zl, c2[:-1]], axis=0)

    weights_b = (
        jnp.swapaxes(wq, 0, 1),
        jnp.swapaxes(gwh, 0, 1), jnp.swapaxes(gwi_ctx, 0, 1),
        jnp.swapaxes(wri, 0, 1), jnp.swapaxes(l1wi, 0, 1),
        jnp.swapaxes(l1wh, 0, 1), jnp.swapaxes(l2wi, 0, 1),
        jnp.swapaxes(l2wh, 0, 1), wq, bq, mloc, vv,
    )
    res_streams = (ah, ahp, g4, gates1, c1, c1p, gates2, c2, c2p, scores,
                   z1, z2)
    outs = _call_bwd(dx2, dce, dse, res_streams, cumT[0], es, ep, mm_,
                     weights_b, S=S, Bt=Bt, D=D, L=L, E=E, Tp=Tp,
                     interpret=interpret)
    (dxg4, dq, dx0, dgates1, dgates2, denc_seq, denc_proj, dv_b,
     dmloc_b) = outs

    dxg = dxg4[:, :, :3 * D]
    dhg = jnp.concatenate([dxg4[:, :, :2 * D], dxg4[:, :, 3 * D:]], axis=2)

    ctx_prev = jnp.concatenate(
        [jnp.zeros((1, Bp, E), jnp.float32), ctx[:-1]], axis=0
    )
    h1p = jnp.concatenate([zl, h1[:-1]], axis=0)
    h2p = jnp.concatenate([zl, h2[:-1]], axis=0)
    x1 = x0 + h1

    # Weight gradients: everything batchable over (time, batch) as big
    # einsums outside the kernel (the gru/lstm kernels' contract).
    d_gwi_ctx = jnp.einsum("nbe,nbg->eg", ctx_prev, dxg)
    d_gwh = jnp.einsum("nbd,nbg->dg", ahp, dhg)
    d_gbh = jnp.sum(dhg, axis=(0, 1))[None]
    d_wq = jnp.einsum("nbd,nbq->dq", ah, dq)
    d_bq = jnp.sum(dq, axis=(0, 1))[None]
    cat = jnp.concatenate([ctx, ah], axis=2)
    d_wri = jnp.einsum("nbc,nbl->cl", cat, dx0)
    d_bri = jnp.sum(dx0, axis=(0, 1))[None]
    d_l1wi = jnp.einsum("nbl,nbg->lg", x0, dgates1)
    d_l1wh = jnp.einsum("nbl,nbg->lg", h1p, dgates1)
    d_l1b = jnp.sum(dgates1, axis=(0, 1))[None]
    d_l2wi = jnp.einsum("nbl,nbg->lg", x1, dgates2)
    d_l2wh = jnp.einsum("nbl,nbg->lg", h2p, dgates2)
    d_l2b = jnp.sum(dgates2, axis=(0, 1))[None]
    d_mloc = jnp.sum(dmloc_b, axis=0)
    d_vv = jnp.sum(dv_b, axis=(0, 1))[None]

    d_weights = (d_gwh, d_gbh, d_wq, d_bq, d_mloc, d_vv, d_wri, d_bri,
                 d_l1wi, d_l1wh, d_l1b, d_l2wi, d_l2wh, d_l2b, d_gwi_ctx)
    d_xg_pre = dxg[:n, :B].astype(xg_dt)
    d_enc_seq = denc_seq[0, :B, :T].astype(enc_dt)
    d_enc_proj = denc_proj[0, :B, :T].astype(enc_dt)
    d_char_mask = jnp.zeros((B, T), enc_dt)
    d_amask = jnp.zeros((B, T), enc_dt)
    d_zo1 = jnp.zeros((n, B, L), enc_dt)
    d_zo2 = jnp.zeros((n, B, L), enc_dt)
    return (d_weights, d_xg_pre, d_enc_seq, d_enc_proj, d_char_mask,
            d_amask, d_zo1, d_zo2)


taco_decoder_train_fused.defvjp(_fwd_vjp, _bwd_vjp)


# ---------------------------------------------------------------------------
# Weight preparation (differentiable — plain jax ops, so parameter
# gradients flow through it from the custom-VJP'd kernel call)
# ---------------------------------------------------------------------------


def prepare_train_weights(params, d, E: int):
    """Transpose raw checkpoint params into the kernel layouts. All ops are
    linear jax transforms, so ``jax.grad`` through the fused call chains
    back to the original parameter tree automatically (including the
    lsa_conv-bias fold into bq)."""
    p = params
    f32 = jnp.float32

    wih = p["attn_rnn"]["weight_ih"].astype(f32)         # (3D, E + 2D)
    gwi_ctx = wih[:, :E].T                               # (E, 3D)
    gwh = p["attn_rnn"]["weight_hh"].astype(f32).T       # (D, 3D)
    gbh = p["attn_rnn"]["bias_hh"].astype(f32)[None]     # (1, 3D)

    conv_w = p["lsa_conv"]["weight"].astype(f32)         # (F, 1, 31)
    conv_b = p["lsa_conv"].get("bias")
    L_w = p["lsa_L"]["weight"].astype(f32)               # (D, F)
    mloc31 = jnp.einsum("fk,df->kd", conv_w[:, 0, :], L_w)  # (31, D)
    mloc = jnp.concatenate(
        [mloc31, jnp.zeros((1, mloc31.shape[1]), f32)], axis=0
    )                                                    # (32, D)
    loc_bias = (jnp.einsum("f,df->d", conv_b.astype(f32), L_w)
                if conv_b is not None else 0.0)

    wq = p["lsa_W"]["weight"].astype(f32).T              # (D, D)
    bq = (p["lsa_W"]["bias"].astype(f32) + loc_bias)[None]
    vv = p["lsa_v"]["weight"].astype(f32).reshape(1, -1)  # (1, D)

    wri = p["rnn_input"]["weight"].astype(f32).T         # (E + D, L)
    bri = p["rnn_input"]["bias"].astype(f32)[None]

    def lstm_w(name):
        wi = p[name]["weight_ih"].astype(f32).T          # (L, 4L)
        wh = p[name]["weight_hh"].astype(f32).T
        b = (p[name]["bias_ih"] + p[name]["bias_hh"]).astype(f32)[None]
        return wi, wh, b

    l1wi, l1wh, l1b = lstm_w("res_rnn1")
    l2wi, l2wh, l2b = lstm_w("res_rnn2")
    return (gwh, gbh, wq, bq, mloc, vv, wri, bri,
            l1wi, l1wh, l1b, l2wi, l2wh, l2b, gwi_ctx)
