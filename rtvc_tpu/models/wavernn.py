"""WaveRNN vocoder family — TPU-native rebuild (three variants).

Architecture parity with the reference (ref: vocoder/models/
{fatchord,geneing,runtimeracer}_version.py):
  * ``fatchord-wavernn`` — 2× GRU(512) + 3 FC, RAW/MOL (fatchord_version.py:88-153)
  * ``geneing-wavernn``  — 1× GRU(256) + 2 FC, BITS/RAW-beta/MOL (geneing_version.py:88-152)
  * ``runtimeracer-wavernn`` — 4× GRU(256) + 5 FC mimicking wider nets
    (runtimeracer_version.py:98-194)
plus the shared MelResNet + Stretch2d upsampler and fold/overlap batched
generation (fatchord_version.py:27-85, 290-404).

TPU-native design (the important part — NOT a translation):
  * Teacher-forced forward: GRUs run as ``lax.scan`` with the whole-sequence
    input projections hoisted into single MXU matmuls.
  * Generation: one fused ``lax.scan`` over samples. Every projection that
    does not depend on the running state — the conditioning column of I, the
    aux halves of each GRU/FC input — is precomputed for the *entire*
    waveform as big batched matmuls before the scan; the loop body keeps only
    the state-dependent skinny matmuls and the sampler. Sampling (categorical
    via Gumbel argmax / logistic mixture / beta) happens in-graph with
    ``jax.random`` — zero host round-trips over the whole utterance.
  * fold-with-overlap is a reshape/gather; folds form the batch axis so one
    long utterance saturates the MXU (the reference fakes this with CPU
    threads, ref: libwavernn/inference.py:87-114).

Weight layouts are torch-compatible so reference checkpoints import 1:1.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.config.vocoder import MODE_BITS, MODE_MOL, MODE_RAW, WaveRNNParams
from rtvc_tpu.models.distribution import (
    sample_from_beta_dist,
    sample_from_discretized_mix_logistic,
)

VOC_FATCHORD = "fatchord-wavernn"
VOC_GENEING = "geneing-wavernn"
VOC_RUNTIMERACER = "runtimeracer-wavernn"


class WaveRNNDims(NamedTuple):
    variant: str
    mode: str
    rnn_dims: int
    fc_dims: int
    bits: int
    pad: int
    upsample_factors: Tuple[int, ...]
    feat_dims: int
    compute_dims: int
    res_out_dims: int
    res_blocks: int
    hop_length: int
    sample_rate: int

    @classmethod
    def from_config(
        cls, variant: str, cfg: WaveRNNParams, feat_dims: int, hop: int, sr: int
    ) -> "WaveRNNDims":
        assert int(np.prod(cfg.upsample_factors)) == hop, (
            "upsample factors must factorise hop_length "
            "(ref assertion: vocoder/models/base.py:27)"
        )
        return cls(
            variant=variant,
            mode=cfg.mode,
            rnn_dims=cfg.rnn_dims,
            fc_dims=cfg.fc_dims,
            bits=cfg.bits,
            pad=cfg.pad,
            upsample_factors=tuple(cfg.upsample_factors),
            feat_dims=feat_dims,
            compute_dims=cfg.compute_dims,
            res_out_dims=cfg.res_out_dims,
            res_blocks=cfg.res_blocks,
            hop_length=hop,
            sample_rate=sr,
        )

    @property
    def n_aux_splits(self) -> int:
        return 2 if self.variant == VOC_GENEING else 4

    @property
    def aux_dims(self) -> int:
        return self.res_out_dims // self.n_aux_splits

    @property
    def n_classes(self) -> int:
        if self.mode == MODE_RAW:
            # geneing's RAW head is a 2-parameter beta distribution
            # (ref: geneing_version.py:95-96)
            return 2 if self.variant == VOC_GENEING else 2**self.bits
        if self.mode == MODE_MOL:
            return 30
        if self.mode == MODE_BITS:
            return 2**self.bits
        raise ValueError(f"Unknown mode {self.mode}")

    @property
    def total_scale(self) -> int:
        return int(np.prod(self.upsample_factors))


# ---------------------------------------------------------------------------
# Functional building blocks (torch weight layouts)
# ---------------------------------------------------------------------------


def _mm(x, w):
    from rtvc_tpu.ops.precision import matmul_dtype

    return jnp.dot(x, w, preferred_element_type=matmul_dtype())


def _linear(p: Dict, x: jax.Array) -> jax.Array:
    y = _mm(x, p["weight"].T)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _bn(p: Dict, s: Dict, x: jax.Array, train: bool, momentum: float = 0.1):
    """BatchNorm over last axis of (B, T, C); returns (y, new_stats).
    Statistics stay f32 under any compute policy (running stats are f32
    state; bf16 reductions over B·T lose bits)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        n = x.size / x.shape[-1]
        new_s = {
            "running_mean": (1 - momentum) * s["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * s["running_var"]
            + momentum * var * n / max(n - 1, 1),
        }
    else:
        mean, var = s["running_mean"], s["running_var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["weight"] + p["bias"]
    return y.astype(x.dtype), new_s


def _conv1d_valid(w: jax.Array, x: jax.Array) -> jax.Array:
    """VALID 1-D conv, torch weight (O, I, K), x (B, T, I) → (B, T-K+1, O)."""
    from rtvc_tpu.ops.precision import matmul_dtype

    return jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w, (2, 1, 0)),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NLC", "LIO", "NLC"),
        preferred_element_type=matmul_dtype(),
    )


def _gru_seq(p: Dict, x: jax.Array) -> jax.Array:
    """Torch-layout single-layer GRU over (B, T, I), zero initial state."""
    B = x.shape[0]
    H = p["weight_hh_l0"].shape[1]
    xg = _mm(x, p["weight_ih_l0"].T) + p["bias_ih_l0"]
    w_hh_t = p["weight_hh_l0"].T
    b_hh = p["bias_hh_l0"]

    from rtvc_tpu.ops.pallas.gru_train_kernel import fused_ok, gru_seq_fused

    if fused_ok(B, H, xg.dtype):
        # Fused Pallas sequence kernel: W_hh VMEM-resident for the whole
        # sequence, custom VJP with the dh chain in a reverse-tile kernel
        # (interpret mode off-TPU so forcing RTVC_FUSED_GRU_TRAIN=1 stays
        # testable on CPU).
        return gru_seq_fused(w_hh_t, b_hh, xg,
                             jax.default_backend() != "tpu")

    from rtvc_tpu.models.layers import gru_step

    def step(h, xg_t):
        h = gru_step(xg_t, h, w_hh_t, b_hh)
        return h, h

    from rtvc_tpu.ops.scanning import scan_unroll

    _, ys = jax.lax.scan(
        step, jnp.zeros((B, H), dtype=xg.dtype), jnp.swapaxes(xg, 0, 1),
        unroll=scan_unroll(),
    )
    return jnp.swapaxes(ys, 0, 1)


# ---------------------------------------------------------------------------
# Upsample network (MelResNet + Stretch2d + smoothing convs)
# ---------------------------------------------------------------------------


def upsample_forward(
    params: Dict, stats: Dict, d: WaveRNNDims, mels: jax.Array, train: bool = False
) -> Tuple[jax.Array, jax.Array, Dict]:
    """mels (B, n_mels, n_frames) → (mels_up (B, T, feat), aux (B, T, res_out),
    new_stats) with T = (n_frames - 2·pad)·total_scale
    (ref: fatchord_version.py:61-85)."""
    rp, rs = params["resnet"], stats["resnet"]
    x = jnp.swapaxes(mels, 1, 2)  # (B, n_frames, n_mels)

    new_rs: Dict[str, Any] = {}
    h = _conv1d_valid(rp["conv_in"]["weight"], x)
    h, new_rs["batch_norm"] = _bn(rp["batch_norm"], rs["batch_norm"], h, train)
    h = jax.nn.relu(h)
    new_layers = []
    for i in range(d.res_blocks):
        lp, ls = rp["layers"][i], rs["layers"][i]
        residual = h
        y = _mm(h, lp["conv1"]["weight"][:, :, 0].T)
        y, s1 = _bn(lp["batch_norm1"], ls["batch_norm1"], y, train)
        y = jax.nn.relu(y)
        y = _mm(y, lp["conv2"]["weight"][:, :, 0].T)
        y, s2 = _bn(lp["batch_norm2"], ls["batch_norm2"], y, train)
        h = y + residual
        new_layers.append({"batch_norm1": s1, "batch_norm2": s2})
    new_rs["layers"] = new_layers
    # 1×1 conv == linear over channels (torch weight (O, I, 1))
    aux = _mm(h, rp["conv_out"]["weight"][:, :, 0].T) + rp["conv_out"]["bias"]

    # Stretch aux along time by total_scale (nearest-neighbor repeat).
    aux = jnp.repeat(aux, d.total_scale, axis=1)

    # Mel upsampling: stretch + learned smoothing conv per scale
    # (torch Conv2d(1,1,(1,2s+1)) ≡ per-channel 1-D conv along time).
    m = jnp.swapaxes(mels, 1, 2)  # (B, n_frames, n_mels)
    for i, scale in enumerate(d.upsample_factors):
        m = jnp.repeat(m, scale, axis=1)
        kernel = params["up_convs"][i].reshape(-1)  # (2·scale+1,)
        K = kernel.shape[0]
        B, T, C = m.shape
        mm = jnp.pad(m, ((0, 0), (scale, scale), (0, 0)))
        # channel-shared conv: fold channels into the batch dim
        mm = jnp.transpose(mm, (0, 2, 1)).reshape(B * C, T + 2 * scale, 1)
        from rtvc_tpu.ops.precision import matmul_dtype

        out = jax.lax.conv_general_dilated(
            mm,
            kernel.reshape(K, 1, 1),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NLC", "LIO", "NLC"),
            preferred_element_type=matmul_dtype(),
        )
        m = jnp.transpose(out.reshape(B, C, T), (0, 2, 1))

    indent = d.pad * d.total_scale
    m = m[:, indent:-indent, :]
    return m, aux, {"resnet": new_rs}


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _lin_init(key, out_dim, in_dim, bias=True):
    s = 1.0 / math.sqrt(in_dim)
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.uniform(k1, (out_dim, in_dim), jnp.float32, -s, s)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_dim,), jnp.float32, -s, s)
    return p


def _gru_init(key, in_dim, hid):
    s = 1.0 / math.sqrt(hid)
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -s, s)
    return {
        "weight_ih_l0": u(ks[0], (3 * hid, in_dim)),
        "weight_hh_l0": u(ks[1], (3 * hid, hid)),
        "bias_ih_l0": u(ks[2], (3 * hid,)),
        "bias_hh_l0": u(ks[3], (3 * hid,)),
    }


def _bn_init(dim):
    return (
        {"weight": jnp.ones(dim), "bias": jnp.zeros(dim)},
        {"running_mean": jnp.zeros(dim), "running_var": jnp.ones(dim)},
    )


def init_wavernn(key: jax.Array, d: WaveRNNDims) -> Dict[str, Any]:
    """Initialize {'params', 'batch_stats'} for a WaveRNN variant."""
    keys = jax.random.split(key, 24)
    aux = d.aux_dims
    k_size = d.pad * 2 + 1

    def conv_init(k, out_c, in_c, ksize, bias=False):
        s = 1.0 / math.sqrt(in_c * ksize)
        k1, k2 = jax.random.split(k)
        p = {
            "weight": jax.random.uniform(
                k1, (out_c, in_c, ksize), jnp.float32, -s, s
            )
        }
        if bias:
            p["bias"] = jax.random.uniform(k2, (out_c,), jnp.float32, -s, s)
        return p

    bn_p, bn_s = _bn_init(d.compute_dims)
    layers_p, layers_s = [], []
    for i in range(d.res_blocks):
        b1p, b1s = _bn_init(d.compute_dims)
        b2p, b2s = _bn_init(d.compute_dims)
        layers_p.append(
            {
                "conv1": conv_init(
                    jax.random.fold_in(keys[0], 2 * i), d.compute_dims,
                    d.compute_dims, 1,
                ),
                "conv2": conv_init(
                    jax.random.fold_in(keys[0], 2 * i + 1), d.compute_dims,
                    d.compute_dims, 1,
                ),
                "batch_norm1": b1p,
                "batch_norm2": b2p,
            }
        )
        layers_s.append({"batch_norm1": b1s, "batch_norm2": b2s})

    resnet_p = {
        "conv_in": conv_init(keys[1], d.compute_dims, d.feat_dims, k_size),
        "batch_norm": bn_p,
        "layers": layers_p,
        "conv_out": conv_init(keys[2], d.res_out_dims, d.compute_dims, 1, bias=True),
    }
    # Smoothing convs start as moving averages (ref: fatchord_version.py:74-76).
    up_convs = [
        jnp.full((1, 1, 1, 2 * s + 1), 1.0 / (2 * s + 1), jnp.float32)
        for s in d.upsample_factors
    ]

    params: Dict[str, Any] = {
        "upsample": {"resnet": resnet_p, "up_convs": up_convs},
        "I": _lin_init(keys[3], d.rnn_dims, d.feat_dims + aux),
    }
    stats = {"upsample": {"resnet": {"batch_norm": bn_s, "layers": layers_s}}}

    if d.variant == VOC_FATCHORD:
        params["rnn1"] = _gru_init(keys[4], d.rnn_dims, d.rnn_dims)
        params["rnn2"] = _gru_init(keys[5], d.rnn_dims + aux, d.rnn_dims)
        params["fc1"] = _lin_init(keys[6], d.fc_dims, d.rnn_dims + aux)
        params["fc2"] = _lin_init(keys[7], d.fc_dims, d.fc_dims + aux)
        params["fc3"] = _lin_init(keys[8], d.n_classes, d.fc_dims)
    elif d.variant == VOC_GENEING:
        params["rnn1"] = _gru_init(keys[4], d.rnn_dims, d.rnn_dims)
        params["fc1"] = _lin_init(keys[6], d.fc_dims, d.rnn_dims + aux)
        params["fc3"] = _lin_init(keys[8], d.n_classes, d.fc_dims)
    elif d.variant == VOC_RUNTIMERACER:
        params["rnn1"] = _gru_init(keys[4], d.rnn_dims, d.rnn_dims)
        params["rnn2"] = _gru_init(keys[5], d.rnn_dims, d.rnn_dims)
        params["rnn3"] = _gru_init(keys[9], d.rnn_dims + aux, d.rnn_dims)
        params["rnn4"] = _gru_init(keys[10], d.rnn_dims, d.rnn_dims)
        params["fc1"] = _lin_init(keys[6], d.fc_dims, d.rnn_dims + aux)
        params["fc2"] = _lin_init(keys[7], d.fc_dims, d.fc_dims)
        params["fc3"] = _lin_init(keys[11], d.fc_dims, d.fc_dims + aux)
        params["fc4"] = _lin_init(keys[12], d.fc_dims, d.fc_dims)
        params["fc5"] = _lin_init(keys[8], d.n_classes, d.fc_dims)
    else:
        raise ValueError(f"Unknown WaveRNN variant {d.variant}")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Teacher-forced forward (training path)
# ---------------------------------------------------------------------------


def wavernn_forward(
    variables: Dict,
    d: WaveRNNDims,
    x: jax.Array,
    mels: jax.Array,
    train: bool = True,
) -> Tuple[jax.Array, Dict]:
    """Teacher-forced forward: x (B, T) previous samples in [-1, 1]; mels
    (B, n_mels, n_frames). Returns (head output (B, T, n_classes), new_stats).

    Structure per variant mirrors the reference forwards
    (fatchord_version.py:120-153, geneing_version.py:121-152,
    runtimeracer_version.py:139-194).
    """
    p, s = variables["params"], variables["batch_stats"]
    aux_d = d.aux_dims
    mels_up, aux, new_up_stats = upsample_forward(
        p["upsample"], s["upsample"], d, mels, train
    )
    splits = [aux[:, :, aux_d * i : aux_d * (i + 1)] for i in range(d.n_aux_splits)]

    inp = jnp.concatenate([x[:, :, None], mels_up, splits[0][:, :, :-1]], axis=2)
    h = _linear(p["I"], inp)

    if d.variant == VOC_FATCHORD:
        res = h
        h = _gru_seq(p["rnn1"], h) + res
        res = h
        h = _gru_seq(p["rnn2"], jnp.concatenate([h, splits[1]], axis=2)) + res
        h = jax.nn.relu(_linear(p["fc1"], jnp.concatenate([h, splits[2]], axis=2)))
        h = jax.nn.relu(_linear(p["fc2"], jnp.concatenate([h, splits[3]], axis=2)))
        out = _linear(p["fc3"], h)
    elif d.variant == VOC_GENEING:
        res = h
        h = _gru_seq(p["rnn1"], h) + res
        h = jax.nn.relu(_linear(p["fc1"], jnp.concatenate([h, splits[1]], axis=2)))
        out = _linear(p["fc3"], h)
        if d.mode == MODE_BITS:
            # log-probs in f32 under any compute policy
            out = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
    else:  # runtimeracer
        res = h
        h = _gru_seq(p["rnn1"], h) + res
        res = h
        h = _gru_seq(p["rnn2"], h) + res
        res = h
        h = _gru_seq(p["rnn3"], jnp.concatenate([h, splits[1]], axis=2)) + res
        res = h
        h = _gru_seq(p["rnn4"], h) + res
        h = _linear(p["fc1"], jnp.concatenate([h, splits[2]], axis=2))
        h = jax.nn.relu(_linear(p["fc2"], h))
        h = _linear(p["fc3"], jnp.concatenate([h, splits[3]], axis=2))
        h = jax.nn.relu(_linear(p["fc4"], h))
        out = _linear(p["fc5"], h)

    return out, {"upsample": new_up_stats}


# ---------------------------------------------------------------------------
# Fold / unfold (batched generation over one long utterance)
# ---------------------------------------------------------------------------


def fold_with_overlap(
    x: jax.Array, target: int, overlap: int
) -> Tuple[jax.Array, int]:
    """(1, T, C) → (num_folds, target + 2·overlap, C)
    (ref: fatchord_version.py:290-340). Host-side shape math, device gather."""
    _, total_len, features = x.shape
    num_folds = (total_len - overlap) // (target + overlap)
    extended_len = num_folds * (overlap + target) + overlap
    remaining = total_len - extended_len
    if remaining != 0:
        num_folds += 1
        padding = target + 2 * overlap - remaining
        x = jnp.pad(x, ((0, 0), (0, padding), (0, 0)))
    starts = np.arange(num_folds) * (target + overlap)
    idx = starts[:, None] + np.arange(target + 2 * overlap)[None, :]
    return x[0][jnp.asarray(idx)], num_folds


def xfade_and_unfold(y: jax.Array, target: int, overlap: int) -> jax.Array:
    """(num_folds, target + 2·overlap) → (total_len,) with equal-power
    crossfade (ref: fatchord_version.py:342-404)."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    total_len = num_folds * (target + overlap) + overlap

    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = jnp.linspace(-1.0, 1.0, fade_len, dtype=y.dtype)
    fade_in = jnp.concatenate(
        [jnp.zeros(silence_len, y.dtype), jnp.sqrt(0.5 * (1.0 + t))]
    )
    fade_out = jnp.concatenate(
        [jnp.sqrt(0.5 * (1.0 - t)), jnp.zeros(silence_len, y.dtype)]
    )

    y = y.at[:, :overlap].multiply(fade_in)
    y = y.at[:, -overlap:].multiply(fade_out)

    starts = jnp.arange(num_folds) * (target + overlap)
    idx = starts[:, None] + jnp.arange(length)[None, :]
    return (
        jnp.zeros(total_len, y.dtype).at[idx.reshape(-1)].add(y.reshape(-1))
    )


# ---------------------------------------------------------------------------
# Autoregressive generation (the hot path)
# ---------------------------------------------------------------------------


def _hoist_aux(p: Dict, d: WaveRNNDims, mels_up, splits):
    """Precompute every projection of the conditioning signals as full-sequence
    MXU matmuls; return per-step tensors consumed inside the scan."""
    aux_d = d.aux_dims
    R = d.rnn_dims
    pre: Dict[str, jax.Array] = {}
    # I: x_prev occupies input column 0; the rest is conditioning.
    w_I = p["I"]["weight"]  # (rnn, 1 + feat + aux-1)
    cond = jnp.concatenate([mels_up, splits[0][:, :, :-1]], axis=2)
    pre["i_cond"] = _mm(cond, w_I[:, 1:].T) + p["I"]["bias"]
    pre["i_prev_col"] = w_I[:, 0]  # (rnn,)

    def split_gru(name, aux_split):
        """GRU whose input is cat([state, aux]): hoist the aux half of W_ih."""
        w_ih = p[name]["weight_ih_l0"]
        pre[f"{name}_aux"] = _mm(aux_split, w_ih[:, R:].T) + p[name]["bias_ih_l0"]
        pre[f"{name}_wx"] = w_ih[:, :R].T

    def split_fc(name, aux_split, in_dim):
        w = p[name]["weight"]
        pre[f"{name}_aux"] = _mm(aux_split, w[:, in_dim:].T) + p[name]["bias"]
        pre[f"{name}_wx"] = w[:, :in_dim].T

    if d.variant == VOC_FATCHORD:
        split_gru("rnn2", splits[1])
        split_fc("fc1", splits[2], d.rnn_dims)
        split_fc("fc2", splits[3], d.fc_dims)
    elif d.variant == VOC_GENEING:
        split_fc("fc1", splits[1], d.rnn_dims)
    else:  # runtimeracer
        split_gru("rnn3", splits[1])
        split_fc("fc1", splits[2], d.rnn_dims)
        split_fc("fc3", splits[3], d.fc_dims)
    return pre


def _sample_step(
    d: WaveRNNDims, logits: jax.Array, key: jax.Array, argmax: bool = False
) -> jax.Array:
    """One sampling step → float sample in [-1, 1], shape (B,).

    ``argmax=True`` is a deterministic test hook (greedy decode) used for
    bit-level cross-implementation parity with the native C++ engine."""
    if d.mode == MODE_MOL:
        if argmax:
            k = d.n_classes // 3
            comp = jnp.argmax(logits[:, :k], axis=-1)
            mean = jnp.take_along_axis(logits[:, k : 2 * k], comp[:, None], 1)[:, 0]
            return jnp.clip(mean, -1.0, 1.0)
        return sample_from_discretized_mix_logistic(key, logits[:, :, None])[:, 0]
    if d.mode == MODE_RAW and d.variant == VOC_GENEING:
        if argmax:
            alpha = jnp.exp(logits[:, 0])
            beta = jnp.exp(logits[:, 1])
            mode_ok = (alpha > 1) & (beta > 1)
            m = jnp.where(
                mode_ok, (alpha - 1) / (alpha + beta - 2), alpha / (alpha + beta)
            )
            return 2.0 * m - 1.0
        return sample_from_beta_dist(key, logits[:, None, :])[:, 0]
    # RAW / BITS: categorical over n_classes via Gumbel argmax
    if argmax:
        label = jnp.argmax(logits, axis=-1).astype(jnp.float32)
    else:
        gumbel = -jnp.log(
            -jnp.log(jax.random.uniform(key, logits.shape, minval=1e-9, maxval=1.0))
        )
        label = jnp.argmax(logits + gumbel, axis=-1).astype(jnp.float32)
    return 2.0 * label / (d.n_classes - 1.0) - 1.0


def generate_core(
    variables: Dict,
    d: WaveRNNDims,
    mels_up: jax.Array,
    aux: jax.Array,
    key: jax.Array,
    argmax: bool = False,
    compute_dtype: Any = jnp.float32,
) -> jax.Array:
    """Run the AR sample loop over upsampled conditioning (B, T, ·) →
    samples (B, T) in [-1, 1]. jit-compiled per (B, T) shape.

    ``compute_dtype=jnp.bfloat16`` halves the per-step HBM weight traffic —
    the dominant cost of the sequential loop on TPU (weights re-stream from
    HBM every scan iteration); matmuls still accumulate in fp32 and the
    sampler runs in fp32."""
    p = variables["params"]
    if compute_dtype != jnp.float32:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, t,
        )
        p = cast(p)
        mels_up = mels_up.astype(compute_dtype)
        aux = aux.astype(compute_dtype)
    aux_d = d.aux_dims
    splits = [aux[:, :, aux_d * i : aux_d * (i + 1)] for i in range(d.n_aux_splits)]
    pre = _hoist_aux(p, d, mels_up, splits)
    B, T, _ = mels_up.shape
    R = d.rnn_dims

    from rtvc_tpu.models.layers import gru_step

    def gru_ih_full(name):
        w_ih = p[name]["weight_ih_l0"]
        return w_ih.T, p[name]["bias_ih_l0"]

    # Per-variant per-step function
    if d.variant == VOC_FATCHORD:
        rnn1_wx, rnn1_b = gru_ih_full("rnn1")

        def cell(x, h_states, t_pre):
            h1, h2, h3, h4 = h_states
            h1 = gru_step(
                _mm(x, rnn1_wx) + rnn1_b, h1,
                p["rnn1"]["weight_hh_l0"].T, p["rnn1"]["bias_hh_l0"],
            )
            x = x + h1
            h2 = gru_step(
                _mm(x, pre["rnn2_wx"]) + t_pre["rnn2_aux"], h2,
                p["rnn2"]["weight_hh_l0"].T, p["rnn2"]["bias_hh_l0"],
            )
            x = x + h2
            x = jax.nn.relu(_mm(x, pre["fc1_wx"]) + t_pre["fc1_aux"])
            x = jax.nn.relu(_mm(x, pre["fc2_wx"]) + t_pre["fc2_aux"])
            logits = _linear(p["fc3"], x)
            return logits, (h1, h2, h3, h4)

        step_pre_names = ["rnn2_aux", "fc1_aux", "fc2_aux"]
    elif d.variant == VOC_GENEING:
        rnn1_wx, rnn1_b = gru_ih_full("rnn1")

        def cell(x, h_states, t_pre):
            h1, h2, h3, h4 = h_states
            h1 = gru_step(
                _mm(x, rnn1_wx) + rnn1_b, h1,
                p["rnn1"]["weight_hh_l0"].T, p["rnn1"]["bias_hh_l0"],
            )
            x = x + h1
            x = jax.nn.relu(_mm(x, pre["fc1_wx"]) + t_pre["fc1_aux"])
            logits = _linear(p["fc3"], x)
            return logits, (h1, h2, h3, h4)

        step_pre_names = ["fc1_aux"]
    else:  # runtimeracer
        rnn1_wx, rnn1_b = gru_ih_full("rnn1")
        rnn2_wx, rnn2_b = gru_ih_full("rnn2")
        rnn4_wx, rnn4_b = gru_ih_full("rnn4")

        def cell(x, h_states, t_pre):
            h1, h2, h3, h4 = h_states
            h1 = gru_step(
                _mm(x, rnn1_wx) + rnn1_b, h1,
                p["rnn1"]["weight_hh_l0"].T, p["rnn1"]["bias_hh_l0"],
            )
            x = x + h1
            h2 = gru_step(
                _mm(x, rnn2_wx) + rnn2_b, h2,
                p["rnn2"]["weight_hh_l0"].T, p["rnn2"]["bias_hh_l0"],
            )
            x = x + h2
            h3 = gru_step(
                _mm(x, pre["rnn3_wx"]) + t_pre["rnn3_aux"], h3,
                p["rnn3"]["weight_hh_l0"].T, p["rnn3"]["bias_hh_l0"],
            )
            x = x + h3
            h4 = gru_step(
                _mm(x, rnn4_wx) + rnn4_b, h4,
                p["rnn4"]["weight_hh_l0"].T, p["rnn4"]["bias_hh_l0"],
            )
            x = x + h4
            x = _mm(x, pre["fc1_wx"]) + t_pre["fc1_aux"]
            x = jax.nn.relu(_linear(p["fc2"], x))
            x = _mm(x, pre["fc3_wx"]) + t_pre["fc3_aux"]
            x = jax.nn.relu(_linear(p["fc4"], x))
            logits = _linear(p["fc5"], x)
            return logits, (h1, h2, h3, h4)

        step_pre_names = ["rnn3_aux", "fc1_aux", "fc3_aux"]

    # Scan inputs: per-step precomputed projections, time-major (and in the
    # compute dtype so the streamed conditioning matches the weight traffic).
    xs = {
        "i_cond": jnp.swapaxes(pre["i_cond"], 0, 1).astype(compute_dtype),
        "key": jax.random.split(key, T),
    }
    for nm in step_pre_names:
        xs[nm] = jnp.swapaxes(pre[nm], 0, 1).astype(compute_dtype)

    h0 = tuple(jnp.zeros((B, R)) for _ in range(4))

    def body(carry, t_in):
        prev, h_states = carry
        x = t_in["i_cond"] + (
            prev.astype(compute_dtype)[:, None] * pre["i_prev_col"][None, :]
        )
        logits, h_states = cell(x, h_states, t_in)
        # matmuls accumulate fp32; keep the carry in the compute dtype
        h_states = tuple(h.astype(compute_dtype) for h in h_states)
        sample = _sample_step(d, logits.astype(jnp.float32), t_in["key"], argmax)
        return (sample, h_states), sample

    h0 = tuple(h.astype(compute_dtype) for h in h0)
    (_, _), samples = jax.lax.scan(body, (jnp.zeros(B), h0), xs)
    return jnp.swapaxes(samples, 0, 1)  # (B, T)


@functools.partial(
    jax.jit,
    static_argnames=("d", "batched", "target", "overlap", "mu_law",
                     "apply_preemphasis", "compute_dtype", "use_pallas",
                     "stream_dtype"),
)
def _generate_pipeline(
    variables: Dict,
    d: WaveRNNDims,
    mels: jax.Array,
    key: jax.Array,
    batched: bool,
    target: int,
    overlap: int,
    mu_law: bool,
    apply_preemphasis: bool,
    compute_dtype: Any = jnp.float32,
    use_pallas: bool = False,
    stream_dtype: Any = jnp.bfloat16,
) -> jax.Array:
    """The whole generation path as ONE jitted XLA graph — upsample, fold, AR
    scan, crossfade-unfold, mu-law decode, de-emphasis. A single dispatch per
    utterance; everything stays on-device until the final waveform."""
    mels = jnp.pad(mels, ((0, 0), (0, 0), (d.pad, d.pad)))
    mels_up, aux, _ = upsample_forward(
        variables["params"]["upsample"], variables["batch_stats"]["upsample"],
        d, mels, train=False,
    )
    if batched:
        mels_up, _ = fold_with_overlap(mels_up, target, overlap)
        aux, _ = fold_with_overlap(aux, target, overlap)

    if use_pallas:
        from rtvc_tpu.ops.pallas.wavernn_kernel import generate_core_pallas

        # bf16 conditioning streams by default: the per-step HBM->VMEM
        # conditioning traffic, not the resident weights, bounds the kernel
        # (+36% rate measured at f32 compute). stream_dtype=f32 restores
        # reference-parity numerics (inference.vocoder.set_generation_options).
        samples = generate_core_pallas(
            variables, d, mels_up, aux, key, compute_dtype=compute_dtype,
            stream_dtype=stream_dtype,
        )
    else:
        samples = generate_core(variables, d, mels_up, aux, key,
                                compute_dtype=compute_dtype)

    if batched:
        output = xfade_and_unfold(samples, target, overlap)
    else:
        output = samples[0]

    if mu_law:
        from rtvc_tpu.ops.audio import decode_mu_law

        output = decode_mu_law(output, d.n_classes, from_labels=False)
    if apply_preemphasis:
        from rtvc_tpu.ops.audio import de_emphasis

        output = de_emphasis(output, 0.97)
    return output


_FRAME_BUCKET = 64


def wavernn_generate(
    variables: Dict,
    d: WaveRNNDims,
    mels: np.ndarray,
    key: jax.Array,
    batched: bool = True,
    target: int = 6000,
    overlap: int = 1000,
    mu_law: bool = True,
    apply_preemphasis: bool = True,
    compute_dtype: Any = jnp.float32,
    use_pallas: bool = False,
    stream_dtype: Any = jnp.bfloat16,
    fade_out: bool = True,
) -> np.ndarray:
    """Full generation pipeline (ref: fatchord_version.py:155-265):
    pad → upsample → fold → AR scan → unfold/crossfade → mu-law decode →
    de-emphasis → fade-out. Returns a float64 numpy waveform.

    Mel frame counts are bucketed to multiples of 64 (padded with the
    normalized silence value) so repeated calls share a small set of
    compiled graphs; the waveform is trimmed back to the exact length.
    """
    mu_law = mu_law if d.mode == MODE_RAW else False

    mels = jnp.asarray(mels, dtype=jnp.float32)
    if mels.ndim == 2:
        mels = mels[None]
    n_frames = mels.shape[-1]
    if n_frames < 2:
        raise ValueError(
            f"Need at least 2 mel frames to generate audio, got {n_frames}"
        )
    if mels.shape[1] != d.feat_dims:
        raise ValueError(
            f"Expected {d.feat_dims} mel bins, got {mels.shape[1]} — is the "
            f"mel transposed?"
        )
    wave_len = (n_frames - 1) * d.hop_length

    bucket = -(-n_frames // _FRAME_BUCKET) * _FRAME_BUCKET
    if bucket != n_frames:
        mels = jnp.pad(
            mels, ((0, 0), (0, 0), (0, bucket - n_frames)),
            constant_values=-1.0,
        )

    # The Pallas backend covers all heads: categorical, MOL, and (round 2)
    # geneing's 2-parameter beta via in-kernel Marsaglia-Tsang gamma draws.
    output = _generate_pipeline(
        variables, d, mels, key, batched, target, overlap, mu_law,
        apply_preemphasis, compute_dtype, use_pallas, stream_dtype,
    )

    output = np.array(output[:wave_len], dtype=np.float64)  # writable copy
    if fade_out:
        # end-of-utterance fade (ref: fatchord_version.py:257-259) —
        # streaming callers disable it mid-stream (it would dip every chunk)
        fade_len = min(20 * d.hop_length, len(output))
        output[-fade_len:] *= np.linspace(1.0, 0.0, fade_len)
    return output


def wavernn_generate_batch(
    variables: Dict,
    d: WaveRNNDims,
    mels_list,
    key: jax.Array,
    target: int = 1000,
    overlap: int = 400,
    mu_law: bool = True,
    apply_preemphasis: bool = True,
    compute_dtype: Any = jnp.float32,
    use_pallas: bool = False,
    stream_dtype: Any = jnp.bfloat16,
):
    """Vocode SEVERAL utterances in one fused generate call: every
    utterance's fold windows share one batch axis, so short utterances ride
    along with long ones at no extra wall time (true batched multi-utterance
    cloning — the reference vocodes per utterance).

    mels_list: list of (n_mels, T_i) normalized mels. Returns a list of
    float64 waveforms (each trimmed to its own length, with fade-out).
    """
    mu_law = mu_law if d.mode == MODE_RAW else False

    N = len(mels_list)
    frames = [m.shape[-1] for m in mels_list]
    bucket = -(-max(frames) // _FRAME_BUCKET) * _FRAME_BUCKET
    stack = np.full((N, d.feat_dims, bucket), -1.0, np.float32)
    for i, m in enumerate(mels_list):
        stack[:, :, :][i, :, : m.shape[-1]] = np.asarray(m, np.float32)

    wavs = _generate_batch_pipeline(
        variables, d, jnp.asarray(stack), key, target, overlap, mu_law,
        apply_preemphasis, compute_dtype, use_pallas, stream_dtype,
    )
    out = []
    wavs = np.asarray(wavs, dtype=np.float64)
    for i, T_i in enumerate(frames):
        wave_len = (T_i - 1) * d.hop_length
        w = np.array(wavs[i][:wave_len])
        fade_len = min(20 * d.hop_length, len(w))
        w[-fade_len:] *= np.linspace(1.0, 0.0, fade_len)
        out.append(w)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("d", "target", "overlap", "mu_law", "apply_preemphasis",
                     "compute_dtype", "use_pallas", "stream_dtype"),
)
def _generate_batch_pipeline(
    variables: Dict,
    d: WaveRNNDims,
    mels: jax.Array,  # (N, n_mels, T) all same padded length
    key: jax.Array,
    target: int,
    overlap: int,
    mu_law: bool,
    apply_preemphasis: bool,
    compute_dtype: Any,
    use_pallas: bool,
    stream_dtype: Any = jnp.bfloat16,
) -> jax.Array:
    N = mels.shape[0]
    mels = jnp.pad(mels, ((0, 0), (0, 0), (d.pad, d.pad)))
    mels_up, aux, _ = upsample_forward(
        variables["params"]["upsample"], variables["batch_stats"]["upsample"],
        d, mels, train=False,
    )
    # fold every utterance with identical geometry, stack fold batches
    folded_m, folded_a = [], []
    n_folds = None
    for i in range(N):
        fm, n_folds = fold_with_overlap(mels_up[i : i + 1], target, overlap)
        fa, _ = fold_with_overlap(aux[i : i + 1], target, overlap)
        folded_m.append(fm)
        folded_a.append(fa)
    big_m = jnp.concatenate(folded_m, axis=0)
    big_a = jnp.concatenate(folded_a, axis=0)

    if use_pallas:
        from rtvc_tpu.ops.pallas.wavernn_kernel import generate_core_pallas

        samples = generate_core_pallas(
            variables, d, big_m, big_a, key, compute_dtype=compute_dtype,
            stream_dtype=stream_dtype,
        )
    else:
        samples = generate_core(variables, d, big_m, big_a, key,
                                compute_dtype=compute_dtype)

    outs = []
    for i in range(N):
        y = samples[i * n_folds : (i + 1) * n_folds]
        w = xfade_and_unfold(y, target, overlap)
        if mu_law:
            from rtvc_tpu.ops.audio import decode_mu_law

            w = decode_mu_law(w, d.n_classes, from_labels=False)
        if apply_preemphasis:
            from rtvc_tpu.ops.audio import de_emphasis

            w = de_emphasis(w, 0.97)
        outs.append(w)
    return jnp.stack(outs)


# ---------------------------------------------------------------------------
# Torch checkpoint import
# ---------------------------------------------------------------------------


def import_torch_state(sd: dict, d: WaveRNNDims) -> Dict[str, Any]:
    """Reference WaveRNN ``model_state`` → our variables tree."""

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]), dtype=jnp.float32)

    def lin(prefix):
        out = {"weight": arr(prefix + ".weight")}
        if prefix + ".bias" in sd:
            out["bias"] = arr(prefix + ".bias")
        return out

    def gru(prefix):
        return {
            nm: arr(f"{prefix}.{nm}")
            for nm in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")
        }

    def bn(prefix):
        return (
            {"weight": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")},
            {
                "running_mean": arr(prefix + ".running_mean"),
                "running_var": arr(prefix + ".running_var"),
            },
        )

    bn_p, bn_s = bn("upsample.resnet.batch_norm")
    layers_p, layers_s = [], []
    for i in range(d.res_blocks):
        b1p, b1s = bn(f"upsample.resnet.layers.{i}.batch_norm1")
        b2p, b2s = bn(f"upsample.resnet.layers.{i}.batch_norm2")
        layers_p.append(
            {
                "conv1": {"weight": arr(f"upsample.resnet.layers.{i}.conv1.weight")},
                "conv2": {"weight": arr(f"upsample.resnet.layers.{i}.conv2.weight")},
                "batch_norm1": b1p,
                "batch_norm2": b2p,
            }
        )
        layers_s.append({"batch_norm1": b1s, "batch_norm2": b2s})

    # up_layers: torch indices 1, 3, 5 are the smoothing Conv2d weights
    up_convs = [
        arr(f"upsample.up_layers.{2 * i + 1}.weight")
        for i in range(len(d.upsample_factors))
    ]

    params: Dict[str, Any] = {
        "upsample": {
            "resnet": {
                "conv_in": {"weight": arr("upsample.resnet.conv_in.weight")},
                "batch_norm": bn_p,
                "layers": layers_p,
                "conv_out": lin("upsample.resnet.conv_out"),
            },
            "up_convs": up_convs,
        },
        "I": lin("I"),
    }
    stats = {
        "upsample": {"resnet": {"batch_norm": bn_s, "layers": layers_s}}
    }

    rnn_names = {
        VOC_FATCHORD: ["rnn1", "rnn2"],
        VOC_GENEING: ["rnn1"],
        VOC_RUNTIMERACER: ["rnn1", "rnn2", "rnn3", "rnn4"],
    }[d.variant]
    fc_names = {
        VOC_FATCHORD: ["fc1", "fc2", "fc3"],
        VOC_GENEING: ["fc1", "fc3"],
        VOC_RUNTIMERACER: ["fc1", "fc2", "fc3", "fc4", "fc5"],
    }[d.variant]
    for nm in rnn_names:
        params[nm] = gru(nm)
    for nm in fc_names:
        params[nm] = lin(nm)
    return {"params": params, "batch_stats": stats}
