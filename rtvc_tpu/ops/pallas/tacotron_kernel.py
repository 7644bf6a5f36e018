"""Pallas TPU kernel: fused Tacotron autoregressive decoder.

The second-hottest loop in the framework after WaveRNN (SURVEY.md §7): one
decoder iteration per r mel frames — prenet → attention GRU → location-
sensitive attention → 2× residual LSTM → mel/stop projections — a few
hundred sequential steps per utterance. The XLA ``lax.while_loop`` path
re-streams ~33 MB of weights from HBM every iteration; this kernel pins the
decoder weights, the encoder memory, and its attention projection in VMEM
for the whole utterance (``vmem_limit_bytes`` raised — v5e has far more
physical VMEM than the 16 MB default scoped limit):

  * grid = iteration tiles (sequential); all recurrent state (GRU/LSTM
    hiddens+cells, context vector, cumulative attention, previous frame)
    lives in VMEM scratch persisting across tiles;
  * the LSA location conv + 32→D projection collapse into ONE banded
    matrix resident in VMEM (``ploc = cum @ band``) — a single MXU pass
    instead of a conv + projection per iteration;
  * prenet dropout (always-on, Tacotron-2 convention) uses the per-core
    TPU PRNG; a ``dropout=False`` test hook makes the kernel deterministic
    and bit-comparable with the XLA path;
  * data-dependent stopping: a done-flag in scratch skips all compute once
    every stop token fires (outputs stay zero, matching the while_loop).

Mirrors models/tacotron.py:decoder_step (ref: tacotron.py:244-299) exactly,
including the reference's multiplicative char-mask on attention logits.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.models.tacotron import TacotronDims, encode

_TILE = 8  # decoder iterations per grid step


def _ru(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad2(x, rows, cols):
    x = jnp.asarray(x, jnp.float32)
    return jnp.zeros((rows, cols), jnp.float32).at[: x.shape[0], : x.shape[1]].set(x)


def _make_kernel(d: TacotronDims, B: int, r: int, dropout: bool,
                 Mp: int, P: int, Dp: int, Ep: int, Lp: int, Tp: int):
    keep = 1.0 - d.dropout

    def kernel(seed_ref, enc_seq, enc_proj, mmask, amask,
               w1, b1, w2, b2,
               gwi, gwh, gbi, gbh,
               band, wq, bq, vv,
               wri, bri,
               l1wi, l1wh, l1b, l2wi, l2wh, l2b,
               wmel, wstop, bstop,
               mel_out, attn_out, stop_out,
               attn_h, r1h, r1c, r2h, r2c, ctx, cum, prev, done_f):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            attn_h[:] = jnp.zeros_like(attn_h)
            r1h[:] = jnp.zeros_like(r1h)
            r1c[:] = jnp.zeros_like(r1c)
            r2h[:] = jnp.zeros_like(r2h)
            r2c[:] = jnp.zeros_like(r2c)
            ctx[:] = jnp.zeros_like(ctx)
            cum[:] = jnp.zeros_like(cum)
            prev[:] = jnp.zeros_like(prev)
            done_f[0, 0] = 0

        if dropout:
            pltpu.prng_seed(seed_ref[0, 0] + tile)

        mel_out[:] = jnp.zeros_like(mel_out)
        attn_out[:] = jnp.zeros_like(attn_out)
        stop_out[:] = jnp.zeros_like(stop_out)

        def mm(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        def drop(x):
            if not dropout:
                return x
            bits = pltpu.prng_random_bits(x.shape)
            u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
            return jnp.where(u >= d.dropout, x / keep, 0.0)

        def step(k, _):
            gi = tile * _TILE + k

            @pl.when(done_f[0, 0] == 0)
            def _active():
                # Prenet (always-on dropout; ref: tacotron.py:143-157)
                h = jnp.maximum(mm(prev[:], w1[:]) + b1[0], 0.0)
                h = drop(h)
                h = jnp.maximum(mm(h, w2[:]) + b2[0], 0.0)
                h = drop(h)

                # Attention GRU (torch gate semantics: b_hn inside the
                # reset product)
                cat = jnp.concatenate([ctx[:], h], axis=1)
                xg = mm(cat, gwi[:]) + gbi[0]
                hg = mm(attn_h[:], gwh[:]) + gbh[0]
                rg = jax.nn.sigmoid(xg[:, :Dp] + hg[:, :Dp])
                zg = jax.nn.sigmoid(xg[:, Dp:2 * Dp] + hg[:, Dp:2 * Dp])
                ng = jnp.tanh(xg[:, 2 * Dp:] + rg * hg[:, 2 * Dp:])
                ah = (1.0 - zg) * ng + zg * attn_h[:]
                attn_h[:] = ah

                # LSA: conv(31)+L fused into ONE banded matmul — band[τ, t, d]
                # = Σ_k M[k, d]·[τ = t + k - 15], resident in VMEM, so the
                # whole location term is a single MXU pass per iteration.
                q = mm(ah, wq[:]) + bq[0]          # (B, Dp)
                Bp_ = enc_proj.shape[0]
                ploc = mm(cum[:].astype(band.dtype), band[:]).reshape(
                    Bp_, Tp, Dp
                )
                t = jnp.tanh(q[:, None, :] + enc_proj[:] + ploc)
                u = jnp.sum(t * vv[0][None, None, :], axis=2)  # (B, Tp)
                # ref multiplies logits by the char mask (tacotron.py:208);
                # kernel-padding columns get -1e30 so they vanish in softmax
                u = u * mmask[:] + amask[:]
                mx = jnp.max(u, axis=1, keepdims=True)
                e = jnp.exp(u - mx)
                scores = e / jnp.sum(e, axis=1, keepdims=True)
                cum[:] = cum[:] + scores
                ctx[:] = jnp.sum(scores[:, :, None] * enc_seq[:], axis=1)

                # Residual LSTMs
                x = mm(jnp.concatenate([ctx[:], ah], axis=1), wri[:]) + bri[0]

                def lstm(x, h_s, c_s, wi, wh, b):
                    g = mm(x, wi[:]) + mm(h_s[:], wh[:]) + b[0]
                    i_g = jax.nn.sigmoid(g[:, :Lp])
                    f_g = jax.nn.sigmoid(g[:, Lp:2 * Lp])
                    g_g = jnp.tanh(g[:, 2 * Lp:3 * Lp])
                    o_g = jax.nn.sigmoid(g[:, 3 * Lp:])
                    c = f_g * c_s[:] + i_g * g_g
                    hh = o_g * jnp.tanh(c)
                    h_s[:] = hh
                    c_s[:] = c
                    return hh

                x = x + lstm(x, r1h, r1c, l1wi, l1wh, l1b)
                x = x + lstm(x, r2h, r2c, l2wi, l2wh, l2b)

                mel = mm(x, wmel[:])               # (B, r*128) frame-major
                stopv = jax.nn.sigmoid(
                    mm(jnp.concatenate([x, ctx[:]], axis=1), wstop[:])
                    + bstop[0]
                )

                mel_out[k] = mel
                attn_out[k] = scores
                stop_out[k] = stopv[:, 0]
                prev[:] = mel[:, (r - 1) * 128 : r * 128]

                # Stop when every (real-batch) stop token exceeds 0.5 after
                # step 10 (ref: tacotron.py:434)
                rows = jax.lax.broadcasted_iota(jnp.int32, stopv.shape, 0)
                fired = jnp.logical_or(stopv > 0.5, rows >= B)[:, 0]
                done = jnp.logical_and(jnp.all(fired), gi * r > 10)
                done_f[0, 0] = jnp.where(done, 1, done_f[0, 0])

            return 0

        jax.lax.fori_loop(0, _TILE, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("d", "r", "Tp", "E"))
def _prepare_weights(params: Dict, d: TacotronDims, r: int, Tp: int, E: int):
    """Pad/transpose every decoder weight into its kernel layout (run once
    per loaded model; the result is cached by ``decode_pallas``)."""
    p = params
    D, L, M = d.decoder_dims, d.lstm_dims, d.n_mels
    P = _ru(2 * D, 128)        # prenet fc dims = decoder_dims*2
    Dp, Ep, Lp = _ru(D, 128), _ru(E, 128), _ru(L, 128)
    Mp = 128
    assert M <= Mp

    # Prenet
    w1 = _pad2(p["dec_prenet"]["fc1"]["weight"].T, Mp, P)
    b1 = _pad2(p["dec_prenet"]["fc1"]["bias"][None, :], 1, P)
    w2 = _pad2(p["dec_prenet"]["fc2"]["weight"].T, P, P)
    b2 = _pad2(p["dec_prenet"]["fc2"]["bias"][None, :], 1, P)

    # Attention GRU: input = [context (E @ rows 0..E), prenet (P2 @ rows Ep..)]
    def pad_gru_gates(w_t, rows_real, rows_pad, offset=0):
        out = jnp.zeros((rows_pad, 3 * Dp), jnp.float32)
        for g in range(3):
            out = out.at[offset : offset + rows_real, g * Dp : g * Dp + D].set(
                w_t[:, g * D : (g + 1) * D].astype(jnp.float32)
            )
        return out

    wih_t = p["attn_rnn"]["weight_ih"].T  # (E + 2D, 3D)
    gwi = (
        pad_gru_gates(wih_t[:E], E, Ep + P)
        + pad_gru_gates(wih_t[E:], 2 * D, Ep + P, offset=Ep)
    )
    gwh = pad_gru_gates(p["attn_rnn"]["weight_hh"].T, D, Dp)

    def pad_gate_vec(v, n_g, real, padded):
        out = jnp.zeros((1, n_g * padded), jnp.float32)
        for g in range(n_g):
            out = out.at[0, g * padded : g * padded + real].set(
                v[g * real : (g + 1) * real].astype(jnp.float32)
            )
        return out

    gbi = pad_gate_vec(p["attn_rnn"]["bias_ih"], 3, D, Dp)
    gbh = pad_gate_vec(p["attn_rnn"]["bias_hh"], 3, D, Dp)

    # LSA: fuse conv (32 filters, width 31) with the 32→D projection.
    # mloc[k] = K[k] @ L^T; the conv bias rides along every tap once —
    # fold it by adding (b_conv @ L^T)/31 per tap? No: bias adds once, so
    # append it to tap 15's shift (identity shift) contribution via a
    # separate constant. Simpler: bake bias into mloc via an extra row and
    # a ones-shift — instead we add it to the query bias (bq), which enters
    # the same tanh sum.
    conv_w = p["lsa_conv"]["weight"]                    # (32, 1, 31)
    conv_b = p["lsa_conv"].get("bias", jnp.zeros(32))
    L_w = p["lsa_L"]["weight"]                          # (D, 32)
    mloc = jnp.einsum("fk,df->kd", conv_w[:, 0, :], L_w)  # (31, D)
    loc_bias = jnp.einsum("f,df->d", conv_b, L_w)       # (D,)

    wq = _pad2(p["lsa_W"]["weight"].T, Dp, Dp)
    bq = _pad2((p["lsa_W"]["bias"] + loc_bias)[None, :], 1, Dp)
    vv = _pad2(p["lsa_v"]["weight"], 1, Dp)             # (1, D)

    # Banded location operator: ploc = cum @ band reshaped (B, Tp, Dp) with
    # band[τ, t·Dp + d] = Σ_k mloc[k, d]·[τ = t + k - 15] (the 31-tap conv
    # fused with the 32→D projection). f32 when it fits the VMEM budget,
    # bf16 for long text buckets.
    shift = jnp.asarray(
        np.stack([np.eye(Tp, k=-(k - 15), dtype=np.float32)
                  for k in range(31)])
    )  # (31, Tp_row, Tp_col)
    band3 = jnp.einsum("kij,kd->ijd", shift,
                       jnp.zeros((31, Dp)).at[:, :D].set(mloc))
    band_dtype = jnp.float32 if Tp * Tp * Dp * 4 <= 40 * 1024 * 1024 \
        else jnp.bfloat16
    band = band3.reshape(Tp, Tp * Dp).astype(band_dtype)

    # rnn_input: [context (rows 0..E), attn_hidden (rows Ep..Ep+D)]
    wri_t = p["rnn_input"]["weight"].T  # (E + D, L)
    wri = jnp.zeros((Ep + Dp, Lp), jnp.float32)
    wri = wri.at[:E, :L].set(wri_t[:E].astype(jnp.float32))
    wri = wri.at[Ep : Ep + D, :L].set(wri_t[E:].astype(jnp.float32))
    bri = _pad2(p["rnn_input"]["bias"][None, :], 1, Lp)

    def lstm_tensors(name):
        wi_t = p[name]["weight_ih"].T  # (L, 4L)
        wh_t = p[name]["weight_hh"].T
        b = p[name]["bias_ih"] + p[name]["bias_hh"]

        def pad_gates4(w_t):
            out = jnp.zeros((Lp, 4 * Lp), jnp.float32)
            for g in range(4):
                out = out.at[: w_t.shape[0], g * Lp : g * Lp + L].set(
                    w_t[:, g * L : (g + 1) * L].astype(jnp.float32)
                )
            return out

        return pad_gates4(wi_t), pad_gates4(wh_t), pad_gate_vec(b, 4, L, Lp)

    l1wi, l1wh, l1b = lstm_tensors("res_rnn1")
    l2wi, l2wh, l2b = lstm_tensors("res_rnn2")

    # mel projection, frame-major with 128-lane frames: column s*128 + c =
    # torch column c*max_r + s (ref reshape: (B, n_mels, max_r)[:, :, :r])
    mel_w = p["mel_proj"]["weight"].T  # (L, n_mels*max_r)
    wmel = jnp.zeros((Lp, r * 128), jnp.float32)
    for s in range(r):
        cols = jnp.arange(M) * d.max_r + s
        wmel = wmel.at[:L, s * 128 : s * 128 + M].set(
            mel_w[:, cols].astype(jnp.float32)
        )

    # stop projection: input [x (rows 0..L), context (rows Lp..Lp+E)]
    stop_w = p["stop_proj"]["weight"].T  # (L + E, 1)
    wstop = jnp.zeros((Lp + Ep, 128), jnp.float32)
    wstop = wstop.at[:L, 0].set(stop_w[:L, 0].astype(jnp.float32))
    wstop = wstop.at[Lp : Lp + E, 0].set(stop_w[L:, 0].astype(jnp.float32))
    bstop = jnp.zeros((1, 128), jnp.float32).at[0, 0].set(
        p["stop_proj"]["bias"][0].astype(jnp.float32)
    )

    return (w1, b1, w2, b2, gwi, gwh, gbi, gbh, band, wq, bq, vv, wri, bri,
            l1wi, l1wh, l1b, l2wi, l2wh, l2b, wmel, wstop, bstop)


# Prepared-weight cache, keyed by params identity (one live entry per loaded
# model; bounded so stale models don't accumulate).
_PREP_CACHE: Dict = {}


def _prepared(variables: Dict, d: TacotronDims, r: int, Tp: int, E: int):
    key = (id(variables["params"]), d, r, Tp, E)
    hit = _PREP_CACHE.get(key)
    if hit is not None and hit[0] is variables["params"]:
        return hit[1]
    prep = _prepare_weights(variables["params"], d=d, r=r, Tp=Tp, E=E)
    if len(_PREP_CACHE) > 8:
        _PREP_CACHE.clear()
    _PREP_CACHE[key] = (variables["params"], prep)
    return prep


@functools.partial(
    jax.jit,
    static_argnames=("d", "r", "max_steps", "dropout", "interpret"),
)
def _decode_run(
    weights,
    d: TacotronDims,
    encoder_seq: jax.Array,
    encoder_seq_proj: jax.Array,
    char_mask: jax.Array,
    key: jax.Array,
    r: int,
    max_steps: int,
    dropout: bool,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    from jax.experimental import pallas as pl

    B, T, E = encoder_seq.shape
    D, L, M = d.decoder_dims, d.lstm_dims, d.n_mels
    P = _ru(2 * D, 128)
    Dp, Ep, Lp = _ru(D, 128), _ru(E, 128), _ru(L, 128)
    Mp, Tp, Bp = 128, _ru(T, 128), _ru(B, 8)
    max_iters = max(max_steps // r, 1)
    n_tiles = -(-max_iters // _TILE)
    iters_p = n_tiles * _TILE

    def pad3(x, b, t, c):
        return jnp.zeros((b, t, c), jnp.float32).at[
            : x.shape[0], : x.shape[1], : x.shape[2]
        ].set(x.astype(jnp.float32))

    enc_seq = pad3(encoder_seq, Bp, Tp, Ep)
    enc_proj = pad3(encoder_seq_proj, Bp, Tp, Dp)
    mmask = _pad2(char_mask, Bp, Tp)
    amask = jnp.zeros((Bp, Tp), jnp.float32).at[:, T:].set(-1e30)

    seed = jax.random.key_data(key).reshape(-1)[-1].astype(jnp.int32)
    seed_arr = jnp.asarray([[seed]], jnp.int32)

    inputs = [seed_arr, enc_seq, enc_proj, mmask, amask, *weights]

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
        scratch = [
            pltpu.VMEM((Bp, Dp), jnp.float32),   # attn_h
            pltpu.VMEM((Bp, Lp), jnp.float32),   # r1h
            pltpu.VMEM((Bp, Lp), jnp.float32),   # r1c
            pltpu.VMEM((Bp, Lp), jnp.float32),   # r2h
            pltpu.VMEM((Bp, Lp), jnp.float32),   # r2c
            pltpu.VMEM((Bp, Ep), jnp.float32),   # ctx
            pltpu.VMEM((Bp, Tp), jnp.float32),   # cum
            pltpu.VMEM((Bp, Mp), jnp.float32),   # prev
            pltpu.SMEM((1, 1), jnp.int32),       # done flag
        ]
        seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        kwargs = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            )
        }
    except ImportError:  # pragma: no cover
        vmem, scratch, kwargs = None, [], {}
        seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0))

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=vmem)

    in_specs = [seed_spec] + [const_spec(x.shape) for x in inputs[1:]]
    out_specs = [
        pl.BlockSpec((_TILE, Bp, r * 128), lambda i: (i, 0, 0),
                     memory_space=vmem),
        pl.BlockSpec((_TILE, Bp, Tp), lambda i: (i, 0, 0), memory_space=vmem),
        pl.BlockSpec((_TILE, Bp), lambda i: (i, 0), memory_space=vmem),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((iters_p, Bp, r * 128), jnp.float32),
        jax.ShapeDtypeStruct((iters_p, Bp, Tp), jnp.float32),
        jax.ShapeDtypeStruct((iters_p, Bp), jnp.float32),
    ]

    kernel = _make_kernel(d, B, r, dropout, Mp, P, Dp, Ep, Lp, Tp)
    mel_blk, attn_blk, stop_blk = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*inputs)

    # (iters, Bp, r*128) frame-major → (B, n_mels, max_iters*r)
    mel = mel_blk[:max_iters, :B].reshape(max_iters, B, r, 128)[..., :M]
    mel = jnp.moveaxis(mel, 1, 0).reshape(B, max_iters * r, M)
    mel = jnp.swapaxes(mel, 1, 2)
    attn = jnp.moveaxis(attn_blk[:max_iters, :B, :T], 1, 0)
    stops = jnp.moveaxis(stop_blk[:max_iters, :B], 1, 0)
    return mel, attn, stops


def decode_pallas(
    variables: Dict,
    d: TacotronDims,
    encoder_seq: jax.Array,
    encoder_seq_proj: jax.Array,
    char_mask: jax.Array,
    key: jax.Array,
    r: int,
    max_steps: int,
    dropout: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused decoder loop → (mel (B, n_mels, max_iters*r),
    attn (B, max_iters, T), stops (B, max_iters)).

    Inputs are the ``encode()`` outputs; drop-in for the while_loop in
    ``tacotron_generate`` (the caller derives n_valid from stops). Weight
    preparation (padding + band construction) is cached per loaded model —
    only the kernel runs per call.
    """
    B, T, E = encoder_seq.shape
    Tp = _ru(T, 128)
    weights = _prepared(variables, d, r, Tp, E)
    return _decode_run(
        weights, d, encoder_seq, encoder_seq_proj, char_mask, key,
        r=r, max_steps=max_steps, dropout=dropout, interpret=interpret,
    )


def tacotron_generate_pallas(
    variables: Dict,
    d: TacotronDims,
    chars: jax.Array,
    speaker_embedding: jax.Array,
    r: int,
    rng: jax.Array,
    max_steps: int = 2000,
    dropout: bool = True,
    interpret: bool = False,
):
    """Drop-in for ``tacotron_generate`` (ref: tacotron.py:393-450): XLA
    encoder + fused Pallas decoder. Returns (mel, None, attn, n_valid)."""
    k_enc, k_dec = jax.random.split(rng)
    encoder_seq, encoder_seq_proj, _ = encode(
        variables, d, chars, speaker_embedding, train=False, rng=k_enc
    )
    char_mask = (chars != 0).astype(jnp.float32)
    mel, attn, stops = decode_pallas(
        variables, d, encoder_seq, encoder_seq_proj, char_mask, k_dec,
        r=r, max_steps=max_steps, dropout=dropout, interpret=interpret,
    )
    # First iteration where all stop tokens fired (past step 10) ends the
    # loop — same rule as the XLA while_loop.
    max_iters = stops.shape[1]
    it = jnp.arange(max_iters)
    fired = jnp.all(stops > 0.5, axis=0) & (it * r > 10)
    any_fired = jnp.any(fired)
    first = jnp.argmax(fired)
    n_iters = jnp.where(any_fired, first + 1, max_iters)
    return mel, None, attn, n_iters * r
