"""Shared neural layers for all three model families.

Recurrent cells (LSTM/GRU) are implemented from scratch as ``lax.scan``
recurrences with **torch-compatible parameter layout and gate order** so that
checkpoints trained on the reference (torch ``weight_ih_l0`` etc., gate order
LSTM=[i,f,g,o], GRU=[r,z,n]) can be imported directly — the migration path for
users of the reference framework.

TPU design notes:
  * The input projection ``x @ W_ih^T`` for a whole sequence is hoisted out of
    the scan into one big MXU matmul; only the ``h @ W_hh^T`` recurrence stays
    sequential.
  * Matmul/conv output dtype follows the active mixed-precision policy
    (``rtvc_tpu.ops.precision``): f32 by default; under the bf16 training
    policy the MXU still accumulates in fp32 but streams bf16 activations.
  * Convolutions use ``lax.conv_general_dilated`` in NLC layout (lane dim =
    channels = multiple of 128 where it matters).

Reference counterparts: CBHG/Highway/BatchNormConv/PreNet/LengthRegulator
(ref: synthesizer/models/common_layers.py:7-119, tacotron.py:63-177).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtvc_tpu.ops.scanning import scan_unroll


def _matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    from rtvc_tpu.ops.precision import matmul_dtype

    return jnp.dot(x, w, preferred_element_type=matmul_dtype())


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


# ---------------------------------------------------------------------------
# LSTM (torch layout: W_ih (4H, I), W_hh (4H, H), gates [i, f, g, o])
# ---------------------------------------------------------------------------


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM over (B, T, I) → (B, T, H).

    Equivalent of ``torch.nn.LSTM(batch_first=True)`` (used by the reference
    speaker encoder, ref: encoder/model.py:18-23), as a stack of ``lax.scan``
    recurrences.
    """

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        initial_state: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        B, T, _ = x.shape
        H = self.hidden_size
        scale = 1.0 / (H**0.5)
        h_last, c_last = [], []
        inputs = x
        for layer in range(self.num_layers):
            I = inputs.shape[-1]
            w_ih = self.param(f"weight_ih_l{layer}", _uniform_init(scale), (4 * H, I))
            w_hh = self.param(f"weight_hh_l{layer}", _uniform_init(scale), (4 * H, H))
            b_ih = self.param(f"bias_ih_l{layer}", _uniform_init(scale), (4 * H,))
            b_hh = self.param(f"bias_hh_l{layer}", _uniform_init(scale), (4 * H,))

            if initial_state is None:
                h0 = jnp.zeros((B, H), dtype=inputs.dtype)
                c0 = jnp.zeros((B, H), dtype=inputs.dtype)
            else:
                h0 = initial_state[0][layer]
                c0 = initial_state[1][layer]

            # Hoist the input projection out of the scan: one MXU matmul for
            # the whole sequence.
            xg = _matmul(inputs, w_ih.T) + (b_ih + b_hh)  # (B, T, 4H)
            w_hh_t = w_hh.T  # (H, 4H)

            from rtvc_tpu.ops.pallas.lstm_train_kernel import (
                fused_ok,
                lstm_seq_fused,
            )

            if fused_ok(B, H, inputs.dtype):
                # Fused Pallas sequence kernel (W_hh VMEM-resident, custom
                # VJP with the (dh, dc) chain in a reverse-tile kernel;
                # interpret mode off-TPU keeps RTVC_FUSED_LSTM_TRAIN=1
                # testable on CPU).
                inputs, h_T, c_T = lstm_seq_fused(
                    w_hh_t, xg, h0, c0, jax.default_backend() != "tpu"
                )
                h_last.append(h_T)
                c_last.append(c_T)
                continue

            def step(carry, xg_t):
                h, c = carry
                gates = xg_t + _matmul(h, w_hh_t)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            (h_T, c_T), ys = jax.lax.scan(
                step, (h0, c0), jnp.swapaxes(xg, 0, 1),
                unroll=scan_unroll(),
            )
            inputs = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
            h_last.append(h_T)
            c_last.append(c_T)
        return inputs, (jnp.stack(h_last), jnp.stack(c_last))


def lstm_cell_step(
    params: dict,
    x: jax.Array,
    h: jax.Array,
    c: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Single torch-layout LSTMCell step (for decoder loops).

    ``params`` carries ``weight_ih (4H, I)``, ``weight_hh (4H, H)``,
    ``bias_ih``, ``bias_hh``.
    """
    gates = (
        _matmul(x, params["weight_ih"].T)
        + _matmul(h, params["weight_hh"].T)
        + params["bias_ih"]
        + params["bias_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


class LSTMCell(nn.Module):
    """Torch-layout LSTMCell as a flax module (params only; step via call)."""

    hidden_size: int

    @nn.compact
    def __call__(
        self, x: jax.Array, state: Tuple[jax.Array, jax.Array]
    ) -> Tuple[jax.Array, jax.Array]:
        H = self.hidden_size
        I = x.shape[-1]
        scale = 1.0 / (H**0.5)
        params = {
            "weight_ih": self.param("weight_ih", _uniform_init(scale), (4 * H, I)),
            "weight_hh": self.param("weight_hh", _uniform_init(scale), (4 * H, H)),
            "bias_ih": self.param("bias_ih", _uniform_init(scale), (4 * H,)),
            "bias_hh": self.param("bias_hh", _uniform_init(scale), (4 * H,)),
        }
        h, c = state
        return lstm_cell_step(params, x, h, c)


# ---------------------------------------------------------------------------
# GRU (torch layout: W_ih (3H, I), W_hh (3H, H), gates [r, z, n])
# ---------------------------------------------------------------------------


def gru_step(
    xg_t: jax.Array, h: jax.Array, w_hh_t: jax.Array, b_hh: jax.Array
) -> jax.Array:
    """One GRU step given the precomputed input projection ``xg_t``.

    torch semantics: n = tanh(x·W_in + b_in + r ⊙ (h·W_hn + b_hn)) — the
    hidden-side bias sits *inside* the reset gate product.
    """
    H = h.shape[-1]
    hg = _matmul(h, w_hh_t) + b_hh
    xr, xz, xn = xg_t[..., :H], xg_t[..., H : 2 * H], xg_t[..., 2 * H :]
    hr, hz, hn = hg[..., :H], hg[..., H : 2 * H], hg[..., 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


class GRU(nn.Module):
    """Single-layer (optionally bidirectional) GRU over (B, T, I).

    Equivalent of ``torch.nn.GRU(batch_first=True)`` (used by WaveRNN, ref:
    vocoder/models/fatchord_version.py:102-104, and CBHG, ref:
    synthesizer/models/tacotron.py:104).
    """

    hidden_size: int
    bidirectional: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        h0: Optional[jax.Array] = None,
        lengths: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """``lengths`` (B,) makes the recurrence length-exact: pad frames
        neither advance the carry nor emit output, so the backward direction
        starts from a zero state at each sequence's true last frame —
        equivalent to running torch on the unpadded sequence (the reference
        generate paths run at exact length, e.g. forward_tacotron.py:225-260).
        """
        B, T, I = x.shape
        H = self.hidden_size
        scale = 1.0 / (H**0.5)
        mask = (
            None
            if lengths is None
            else (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)
        )

        def run_direction(
            suffix: str, seq: jax.Array, m: Optional[jax.Array]
        ) -> Tuple[jax.Array, jax.Array]:
            w_ih = self.param(f"weight_ih_l0{suffix}", _uniform_init(scale), (3 * H, I))
            w_hh = self.param(f"weight_hh_l0{suffix}", _uniform_init(scale), (3 * H, H))
            b_ih = self.param(f"bias_ih_l0{suffix}", _uniform_init(scale), (3 * H,))
            b_hh = self.param(f"bias_hh_l0{suffix}", _uniform_init(scale), (3 * H,))
            xg = _matmul(seq, w_ih.T) + b_ih  # (B, T, 3H)
            w_hh_t = w_hh.T
            h_init = jnp.zeros((B, H), dtype=x.dtype) if h0 is None else h0

            if m is None:
                from rtvc_tpu.ops.pallas.gru_train_kernel import (
                    fused_ok,
                    gru_seq_fused,
                )

                if h0 is None and fused_ok(B, H, xg.dtype):
                    # Fused Pallas sequence kernel — this is the CBHG
                    # BiGRU's train path (the Tacotron postnet scans all
                    # ~900 mel frames per step, the longest recurrence in
                    # that stage). Same contract as WaveRNN's _gru_seq.
                    ys = gru_seq_fused(w_hh_t, b_hh, xg,
                                       jax.default_backend() != "tpu")
                    return ys, ys[:, -1]

                def step(h, xg_t):
                    h = gru_step(xg_t, h, w_hh_t, b_hh)
                    return h, h

                h_T, ys = jax.lax.scan(step, h_init, jnp.swapaxes(xg, 0, 1),
                                       unroll=scan_unroll())
            else:

                def step(h, inp):
                    xg_t, m_t = inp
                    h_new = gru_step(xg_t, h, w_hh_t, b_hh)
                    h = jnp.where(m_t[:, None] > 0, h_new, h)
                    return h, h * m_t[:, None]

                h_T, ys = jax.lax.scan(
                    step, h_init,
                    (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(m, 0, 1)),
                    unroll=scan_unroll(),
                )
            return jnp.swapaxes(ys, 0, 1), h_T

        fwd, h_fwd = run_direction("", x, mask)
        if not self.bidirectional:
            return fwd, h_fwd
        bwd, h_bwd = run_direction(
            "_reverse", jnp.flip(x, axis=1),
            None if mask is None else jnp.flip(mask, axis=1),
        )
        bwd = jnp.flip(bwd, axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1), jnp.stack([h_fwd, h_bwd])


class GRUCell(nn.Module):
    """Torch-layout GRUCell (decoder attention RNN, WaveRNN sample loop)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        H = self.hidden_size
        I = x.shape[-1]
        scale = 1.0 / (H**0.5)
        w_ih = self.param("weight_ih", _uniform_init(scale), (3 * H, I))
        w_hh = self.param("weight_hh", _uniform_init(scale), (3 * H, H))
        b_ih = self.param("bias_ih", _uniform_init(scale), (3 * H,))
        b_hh = self.param("bias_hh", _uniform_init(scale), (3 * H,))
        xg = _matmul(x, w_ih.T) + b_ih
        return gru_step(xg, h, w_hh.T, b_hh)


# ---------------------------------------------------------------------------
# Linear / Conv / BatchNorm with torch-compatible layouts
# ---------------------------------------------------------------------------


class Linear(nn.Module):
    """Dense layer with torch layout (weight (O, I)) for checkpoint import."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        I = x.shape[-1]
        scale = 1.0 / (I**0.5)
        w = self.param("weight", _uniform_init(scale), (self.features, I))
        y = _matmul(x, w.T)
        if self.use_bias:
            y = y + self.param("bias", _uniform_init(scale), (self.features,))
        return y


class Conv1d(nn.Module):
    """1-D convolution over (B, T, C) with torch weight layout (O, I, K)."""

    features: int
    kernel_size: int
    use_bias: bool = True
    padding: str | int = "SAME"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        I = x.shape[-1]
        K = self.kernel_size
        scale = 1.0 / ((I * K) ** 0.5)
        w = self.param("weight", _uniform_init(scale), (self.features, I, K))
        # torch layout (O, I, K) → lax (K, I, O) for NLC conv
        kernel = jnp.transpose(w, (2, 1, 0))
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)]
        else:
            pad = self.padding
        from rtvc_tpu.ops.precision import matmul_dtype

        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=pad,
            dimension_numbers=("NLC", "LIO", "NLC"),
            preferred_element_type=matmul_dtype(),
        )
        if self.use_bias:
            y = y + self.param("bias", _uniform_init(scale), (self.features,))
        return y


class BatchNorm1d(nn.Module):
    """BatchNorm over the channel (last) axis of (B, T, C).

    Mirrors ``torch.nn.BatchNorm1d`` semantics (ref BatchNormConv:
    synthesizer/models/common_layers.py:38-52). Uses running stats in
    inference; batch stats (+EMA update) in training.
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones(self.features)
        )
        if train:
            axes = tuple(range(x.ndim - 1))
            # stats in f32 regardless of the compute policy — bf16 mean/var
            # over big batches loses bits, and running stats must stay f32
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            n = x.size / self.features
            if not self.is_initializing():
                ra_mean.value = (
                    1 - self.momentum
                ) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * (
                    var * n / max(n - 1, 1)
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon)
        return ((x - mean) * inv * gamma + beta).astype(x.dtype)


class Embedding(nn.Module):
    """Token embedding with torch layout (num_embeddings, dim)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.features),
        )
        return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# Tacotron building blocks
# ---------------------------------------------------------------------------


class HighwayNetwork(nn.Module):
    """y = g·relu(W1 x) + (1-g)·x (ref: common_layers.py:22-35; gate bias 0)."""

    size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x1 = Linear(self.size, name="W1")(x)
        x2 = Linear(self.size, name="W2")(x)
        g = jax.nn.sigmoid(x2)
        return g * jax.nn.relu(x1) + (1.0 - g) * x


class PreNet(nn.Module):
    """Two ReLU+dropout layers; dropout stays ON at inference (Tacotron 2
    convention, ref: tacotron.py:143-157)."""

    fc1_dims: int = 256
    fc2_dims: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        # NB: the reference applies F.dropout unconditionally in forward —
        # prenet dropout is active at generation time too.
        x = jax.nn.relu(Linear(self.fc1_dims, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=False)(x)
        x = jax.nn.relu(Linear(self.fc2_dims, name="fc2")(x))
        x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


class BatchNormConv(nn.Module):
    """Conv1d (no bias, torch ``padding=k//2``) → optional ReLU → BatchNorm
    (ref: common_layers.py:38-52). For even kernels torch's symmetric k//2
    padding yields one extra output frame; callers trim to ``seq_len`` like
    the reference does."""

    features: int
    kernel_size: int
    relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv1d(
            self.features,
            self.kernel_size,
            use_bias=False,
            padding=self.kernel_size // 2,
            name="conv",
        )(x)
        if self.relu:
            x = jax.nn.relu(x)
        return BatchNorm1d(self.features, name="bnorm")(x, train=train)


class CBHG(nn.Module):
    """Conv bank + highway + BiGRU, on (B, T, C) (NLC — lane-dim channels).

    Two structural variants exist in the reference and both are supported:
      * Tacotron's (ref: tacotron.py:63-141): BiGRU hidden = channels // 2
        (output = channels), no dropout, ``pre_highway`` only when the
        projection width mismatches the highway width;
      * common_layers' (ref: common_layers.py:55-119, used by
        ForwardTacotron): BiGRU hidden = channels (output = 2·channels),
        dropout after maxpool and first projection, ``pre_highway`` always.
    Select with ``forward_variant``.
    """

    K: int
    in_channels: int
    channels: int
    proj_channels: Tuple[int, int]
    num_highways: int
    forward_variant: bool = False
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        lengths: Optional[jax.Array] = None,
    ) -> jax.Array:
        # ``lengths`` (B,) gives length-exact semantics on padded input:
        # every stage re-zeroes pad frames (so convs see the zeros torch's
        # SAME padding would supply at the true boundary) and the BiGRU
        # masks its carries — output then equals running torch on each
        # unpadded sequence (the reference generate paths run unpadded,
        # e.g. tacotron.py:439-441, forward_tacotron.py:254-256).
        if lengths is not None:
            fmask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None]).astype(
                x.dtype
            )[..., None]
            remask = lambda v: v * fmask  # noqa: E731
        else:
            remask = lambda v: v  # noqa: E731

        x = remask(x)
        residual = x
        seq_len = x.shape[1]

        # Conv bank: K parallel convs with kernel sizes 1..K, concat channels.
        conv_bank = []
        for k in range(1, self.K + 1):
            c = BatchNormConv(self.channels, k, name=f"conv1d_bank_{k - 1}")(
                x, train=train
            )
            conv_bank.append(remask(c[:, :seq_len, :]))
        conv_bank = jnp.concatenate(conv_bank, axis=-1)

        # MaxPool1d(kernel=2, stride=1, padding=1) then trim to seq_len:
        # equivalent to a left-pad-1 window over [t-1, t].
        pooled = jax.lax.reduce_window(
            conv_bank,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 2, 1),
            window_strides=(1, 1, 1),
            padding=((0, 0), (1, 0), (0, 0)),
        )
        pooled = remask(pooled)
        if self.forward_variant:
            pooled = nn.Dropout(self.dropout_rate, deterministic=not train)(pooled)

        x = BatchNormConv(self.proj_channels[0], 3, name="conv_project1")(
            pooled, train=train
        )
        x = remask(x)
        if self.forward_variant:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = BatchNormConv(
            self.proj_channels[1], 3, relu=False, name="conv_project2"
        )(x, train=train)
        x = remask(x)

        x = x + residual

        if self.forward_variant or self.proj_channels[-1] != self.channels:
            x = Linear(self.channels, use_bias=False, name="pre_highway")(x)
        for i in range(self.num_highways):
            x = HighwayNetwork(self.channels, name=f"highways_{i}")(x)

        gru_hidden = self.channels if self.forward_variant else self.channels // 2
        out, _ = GRU(gru_hidden, bidirectional=True, name="rnn")(
            remask(x), lengths=lengths
        )
        return out


class LengthRegulator(nn.Module):
    """Repeat each encoder step by its (rounded) duration — gather formulation.

    The reference repeat-interleaves with dynamic output length (ref:
    common_layers.py:7-19); on TPU the output length must be static, so the
    caller supplies ``max_len`` and we build a gather index by inverting the
    cumulative duration with a searchsorted-style comparison. Positions beyond
    the total duration gather step index ``T-1`` and are masked downstream.
    """

    @nn.compact
    def __call__(self, x: jax.Array, durations: jax.Array, max_len: int) -> jax.Array:
        # x: (B, T, C); durations: (B, T) int
        cum = jnp.cumsum(durations, axis=1)  # (B, T) — end position of step t
        positions = jnp.arange(max_len)[None, :, None]  # (1, L, 1)
        # index[b, l] = number of steps whose cumulative end <= l
        idx = jnp.sum(positions >= cum[:, None, :], axis=-1)  # (B, L)
        idx = jnp.minimum(idx, x.shape[1] - 1)
        return jnp.take_along_axis(x, idx[..., None], axis=1)
