"""Tacotron (autoregressive seq2seq synthesizer) — TPU-native rebuild.

Architecture parity with the reference (ref: synthesizer/models/tacotron.py):
  * Encoder: Embedding → PreNet → CBHG, then per-char speaker-embedding concat
    (ref: tacotron.py:12-61);
  * Decoder step: PreNet → attention GRUCell → location-sensitive attention
    (conv K=31, 32 filters) → context → Linear → 2× residual LSTMCells with
    zoneout 0.1 → mel projection (r frames/step, max_r=20) → stop-token head
    (ref: tacotron.py:179-299);
  * CBHG postnet → linear-spectrogram projection (ref: tacotron.py:311-316).

TPU-native design decisions (not a port):
  * teacher-forced training runs the decoder as one ``lax.scan`` — a single
    fused XLA loop instead of a Python per-step loop;
  * generation is a ``lax.while_loop`` writing r frames/iteration into a
    preallocated (B, n_mels, max_steps) buffer — data-dependent stopping
    (all stop tokens > 0.5, ref: tacotron.py:434) without dynamic shapes;
  * the model is a pure function over an explicit params pytree (flax modules
    applied functionally), so steps compose freely with jit/scan/while_loop
    and torch checkpoints map 1:1 onto the tree.

The params tree uses the reference's state-dict naming so
:func:`import_torch_state` is mostly a reshape-free copy.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.models.layers import (
    CBHG,
    Conv1d,
    Embedding,
    Linear,
    PreNet,
    gru_step,
    lstm_cell_step,
)


class TacotronDims(NamedTuple):
    """Static dimensions (hashable — usable as a jit static argument)."""

    num_chars: int
    n_mels: int
    fft_bins: int
    speaker_embedding_size: int
    embed_dims: int
    encoder_dims: int
    decoder_dims: int
    postnet_dims: int
    encoder_K: int
    postnet_K: int
    num_highways: int
    lstm_dims: int
    max_r: int
    dropout: float
    stop_threshold: float

    @classmethod
    def from_config(
        cls, cfg: TacotronParams, num_chars: int, n_mels: int, fft_bins: int, spk: int
    ) -> "TacotronDims":
        return cls(
            num_chars=num_chars,
            n_mels=n_mels,
            fft_bins=fft_bins,
            speaker_embedding_size=spk,
            embed_dims=cfg.embed_dims,
            encoder_dims=cfg.encoder_dims,
            decoder_dims=cfg.decoder_dims,
            postnet_dims=cfg.postnet_dims,
            encoder_K=cfg.encoder_K,
            postnet_K=cfg.postnet_K,
            num_highways=cfg.num_highways,
            lstm_dims=cfg.lstm_dims,
            max_r=cfg.max_r,
            dropout=cfg.dropout,
            stop_threshold=cfg.stop_threshold,
        )


# ---------------------------------------------------------------------------
# Module builders (flax modules applied functionally)
# ---------------------------------------------------------------------------


def _modules(d: TacotronDims) -> Dict[str, Any]:
    return {
        "embedding": Embedding(d.num_chars, d.embed_dims),
        "enc_prenet": PreNet(d.encoder_dims, d.encoder_dims, d.dropout),
        "enc_cbhg": CBHG(
            K=d.encoder_K,
            in_channels=d.encoder_dims,
            channels=d.encoder_dims,
            proj_channels=(d.encoder_dims, d.encoder_dims),
            num_highways=d.num_highways,
        ),
        "encoder_proj": Linear(d.decoder_dims, use_bias=False),
        "dec_prenet": PreNet(d.decoder_dims * 2, d.decoder_dims * 2, d.dropout),
        "lsa_conv": Conv1d(32, 31, padding=15),
        "lsa_L": Linear(d.decoder_dims, use_bias=False),
        "lsa_W": Linear(d.decoder_dims, use_bias=True),
        "lsa_v": Linear(1, use_bias=False),
        "rnn_input": Linear(d.lstm_dims),
        "mel_proj": Linear(d.n_mels * d.max_r, use_bias=False),
        "stop_proj": Linear(1),
        "postnet": CBHG(
            K=d.postnet_K,
            in_channels=d.n_mels,
            channels=d.postnet_dims,
            proj_channels=(d.postnet_dims, d.fft_bins),
            num_highways=d.num_highways,
        ),
        "post_proj": Linear(d.fft_bins, use_bias=False),
    }


def init_tacotron(key: jax.Array, d: TacotronDims) -> Dict[str, Any]:
    """Initialize the variables tree {'params': ..., 'batch_stats': ...}.

    Matches the reference's init: xavier-uniform on every >1-D tensor
    (ref: tacotron.py:453-456).
    """
    mods = _modules(d)
    keys = jax.random.split(key, 20)
    B, T = 1, 8
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def init_mod(i, name, *args, **kwargs):
        variables = mods[name].init(
            {"params": keys[i], "dropout": jax.random.fold_in(keys[i], 1)},
            *args,
            **kwargs,
        )
        params[name] = variables["params"]
        if "batch_stats" in variables:
            stats[name] = variables["batch_stats"]

    init_mod(0, "embedding", jnp.zeros((B, T), jnp.int32))
    init_mod(1, "enc_prenet", jnp.zeros((B, T, d.embed_dims)))
    init_mod(2, "enc_cbhg", jnp.zeros((B, T, d.encoder_dims)))
    enc_out = d.encoder_dims + d.speaker_embedding_size
    init_mod(3, "encoder_proj", jnp.zeros((B, T, enc_out)))
    init_mod(4, "dec_prenet", jnp.zeros((B, d.n_mels)))
    init_mod(5, "lsa_conv", jnp.zeros((B, T, 1)))
    init_mod(6, "lsa_L", jnp.zeros((B, T, 32)))
    init_mod(7, "lsa_W", jnp.zeros((B, d.decoder_dims)))
    init_mod(8, "lsa_v", jnp.zeros((B, T, d.decoder_dims)))
    init_mod(9, "rnn_input", jnp.zeros((B, enc_out + d.decoder_dims)))
    init_mod(10, "mel_proj", jnp.zeros((B, d.lstm_dims)))
    init_mod(11, "stop_proj", jnp.zeros((B, d.lstm_dims + enc_out)))
    init_mod(12, "postnet", jnp.zeros((B, T, d.n_mels)))
    init_mod(13, "post_proj", jnp.zeros((B, T, d.postnet_dims)))

    # GRU / LSTM cells (torch layout, built directly)
    def cell(key, gates, in_dim, hid):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        s = 1.0 / np.sqrt(hid)
        u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -s, s)
        return {
            "weight_ih": u(k1, (gates * hid, in_dim)),
            "weight_hh": u(k2, (gates * hid, hid)),
            "bias_ih": u(k3, (gates * hid,)),
            "bias_hh": u(k4, (gates * hid,)),
        }

    attn_in = d.encoder_dims + d.decoder_dims * 2 + d.speaker_embedding_size
    params["attn_rnn"] = cell(keys[14], 3, attn_in, d.decoder_dims)
    params["res_rnn1"] = cell(keys[15], 4, d.lstm_dims, d.lstm_dims)
    params["res_rnn2"] = cell(keys[16], 4, d.lstm_dims, d.lstm_dims)

    # Reference init: xavier uniform on all >1-D params (tacotron.py:453-456).
    import zlib

    leaves_key = keys[17]

    def xavier(path_key, x):
        if x.ndim > 1:
            fan_in, fan_out = x.shape[-1], x.shape[-2]
            limit = np.sqrt(6.0 / (fan_in + fan_out))
            # crc32 (not hash(): salted per-process) keeps init deterministic.
            nonlocal_key = jax.random.fold_in(
                leaves_key, zlib.crc32(path_key.encode()) % (2**31)
            )
            return jax.random.uniform(nonlocal_key, x.shape, x.dtype, -limit, limit)
        return x

    flat = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = [xavier(jax.tree_util.keystr(p), v) for p, v in flat[0]]
    params = jax.tree_util.tree_unflatten(flat[1], new_leaves)

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _apply(mods, variables, name, *args, rngs=None, mutable=False, **kw):
    """Apply a named submodule functionally; extra kwargs (e.g. ``train``)
    forward to the module's ``__call__``."""
    v = {"params": variables["params"][name]}
    if name in variables.get("batch_stats", {}):
        v["batch_stats"] = variables["batch_stats"][name]
    return mods[name].apply(v, *args, rngs=rngs, mutable=mutable, **kw)


def encode(
    variables: Dict,
    d: TacotronDims,
    chars: jax.Array,
    speaker_embedding: jax.Array,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Dict]:
    """Encoder pass → (encoder_seq, encoder_seq_proj, new_batch_stats)."""
    mods = _modules(d)
    rngs = {"dropout": rng} if rng is not None else {"dropout": jax.random.PRNGKey(0)}
    x = _apply(mods, variables, "embedding", chars)
    x = _apply(mods, variables, "enc_prenet", x, rngs=rngs)
    new_stats = dict(variables.get("batch_stats", {}))
    if train:
        x, upd = _apply(
            mods, variables, "enc_cbhg", x, train=True, rngs=rngs,
            mutable=["batch_stats"],
        )
        new_stats["enc_cbhg"] = upd["batch_stats"]
    else:
        x = _apply(mods, variables, "enc_cbhg", x, train=False, rngs=rngs)

    # Per-char speaker-embedding concat (SV2TTS, ref: tacotron.py:45-61).
    if speaker_embedding.ndim == 1:
        speaker_embedding = speaker_embedding[None, :]
    e = jnp.broadcast_to(
        speaker_embedding[:, None, :],
        (x.shape[0], x.shape[1], speaker_embedding.shape[-1]),
    )
    encoder_seq = jnp.concatenate([x, e], axis=-1)
    encoder_seq_proj = _apply(mods, variables, "encoder_proj", encoder_seq)
    return encoder_seq, encoder_seq_proj, new_stats


class DecoderCarry(NamedTuple):
    attn_hidden: jax.Array
    rnn1_hidden: jax.Array
    rnn1_cell: jax.Array
    rnn2_hidden: jax.Array
    rnn2_cell: jax.Array
    context_vec: jax.Array
    cumulative: jax.Array  # (B, T_text) cumulative attention


def init_decoder_carry(d: TacotronDims, batch: int, t_text: int,
                       dtype=jnp.float32) -> DecoderCarry:
    """``dtype`` sets the recurrent-state precision (the bf16 training
    policy); attention context/cumulative stay f32 under any policy — the
    alignment path is precision-sensitive and its f32 softmax keeps the
    carried scores f32 each iteration."""
    z = functools.partial(jnp.zeros, dtype=dtype)
    zf = functools.partial(jnp.zeros, dtype=jnp.float32)
    return DecoderCarry(
        attn_hidden=z((batch, d.decoder_dims)),
        rnn1_hidden=z((batch, d.lstm_dims)),
        rnn1_cell=z((batch, d.lstm_dims)),
        rnn2_hidden=z((batch, d.lstm_dims)),
        rnn2_cell=z((batch, d.lstm_dims)),
        context_vec=zf((batch, d.encoder_dims + d.speaker_embedding_size)),
        cumulative=zf((batch, t_text)),
    )


def _prenet_nodrop(params: Dict, x: jax.Array, cdt) -> jax.Array:
    """Deterministic PreNet (dropout skipped) — the cross-backend parity
    hook (the reference keeps prenet dropout on even at inference)."""
    h = jax.nn.relu(
        jnp.dot(x, params["fc1"]["weight"].T,
                preferred_element_type=cdt) + params["fc1"]["bias"]
    )
    return jax.nn.relu(
        jnp.dot(h, params["fc2"]["weight"].T,
                preferred_element_type=cdt) + params["fc2"]["bias"]
    )


# Residual-LSTM zoneout probability (ref: tacotron.py:250-254). Module
# constant so the fused train kernel and the scan path share one source
# of truth (tests pin parity by zeroing it).
_ZONEOUT_P = 0.1


def _decoder_recurrence(
    params: Dict,
    d: TacotronDims,
    carry: DecoderCarry,
    xg: jax.Array,
    encoder_seq: jax.Array,
    encoder_seq_proj: jax.Array,
    char_mask: jax.Array,
    k_zo1: jax.Array,
    k_zo2: jax.Array,
    train: bool,
) -> Tuple[DecoderCarry, jax.Array, jax.Array]:
    """The truly sequential half of one decoder iteration: attention GRU →
    LSA → context → 2× zoneout LSTMs. ``xg`` is the attention-GRU input
    projection (input-side matmul + bias_ih) — precomputed by the caller so
    the teacher-forced train path can hoist its prenet-dependent half out
    of the scan. Returns (carry, decoder state x (B, lstm_dims),
    scores (B, T_text)); the caller projects mels/stop from x and
    carry.context_vec."""
    mods = _modules(d)
    attn_hidden = gru_step(
        xg, carry.attn_hidden, params["attn_rnn"]["weight_hh"].T,
        params["attn_rnn"]["bias_hh"],
    )

    # Location-sensitive attention (ref: tacotron.py:195-216)
    processed_query = mods["lsa_W"].apply(
        {"params": params["lsa_W"]}, attn_hidden
    )[:, None, :]
    # cumulative scores are carried f32; the location conv runs in the
    # compute dtype
    location = carry.cumulative[:, :, None].astype(xg.dtype)
    processed_loc = mods["lsa_L"].apply(
        {"params": params["lsa_L"]},
        mods["lsa_conv"].apply({"params": params["lsa_conv"]}, location),
    )
    u = mods["lsa_v"].apply(
        {"params": params["lsa_v"]},
        jnp.tanh(processed_query + encoder_seq_proj + processed_loc),
    )[..., 0]
    # NB the reference multiplies logits (not additively masks) by the pad
    # mask — kept bit-exact for checkpoint parity (ref: tacotron.py:208).
    u = u * char_mask
    # attention softmax + cumulative scores stay f32 under any compute
    # policy — the alignment is the precision-sensitive part of training
    scores = jax.nn.softmax(u.astype(jnp.float32), axis=1)
    cumulative = carry.cumulative + scores

    context_vec = jnp.einsum("bt,btc->bc", scores, encoder_seq)

    x = jnp.concatenate([context_vec, attn_hidden], axis=1)
    x = mods["rnn_input"].apply({"params": params["rnn_input"]}, x)

    def zoneout(key, prev, new, p=None):
        if not train:
            return new
        mask = jax.random.bernoulli(
            key, _ZONEOUT_P if p is None else p, prev.shape
        )
        return jnp.where(mask, prev, new)

    rnn1_hidden_next, rnn1_cell = lstm_cell_step(
        params["res_rnn1"], x, carry.rnn1_hidden, carry.rnn1_cell
    )
    rnn1_hidden = zoneout(k_zo1, carry.rnn1_hidden, rnn1_hidden_next)
    x = x + rnn1_hidden

    rnn2_hidden_next, rnn2_cell = lstm_cell_step(
        params["res_rnn2"], x, carry.rnn2_hidden, carry.rnn2_cell
    )
    rnn2_hidden = zoneout(k_zo2, carry.rnn2_hidden, rnn2_hidden_next)
    x = x + rnn2_hidden

    new_carry = DecoderCarry(
        attn_hidden=attn_hidden,
        rnn1_hidden=rnn1_hidden,
        rnn1_cell=rnn1_cell,
        rnn2_hidden=rnn2_hidden,
        rnn2_cell=rnn2_cell,
        context_vec=context_vec,
        cumulative=cumulative,
    )
    return new_carry, x, scores


def decoder_step(
    params: Dict,
    d: TacotronDims,
    r: int,
    carry: DecoderCarry,
    prenet_in: jax.Array,
    encoder_seq: jax.Array,
    encoder_seq_proj: jax.Array,
    char_mask: jax.Array,
    rng: jax.Array,
    train: bool,
    prenet_dropout: bool = True,
) -> Tuple[DecoderCarry, jax.Array, jax.Array, jax.Array]:
    """One decoder iteration → (carry, mels (B, n_mels, r), scores (B, T),
    stop (B, 1)) (ref: tacotron.py:244-299). ``prenet_dropout=False`` is a
    deterministic test hook for cross-backend parity (the reference keeps
    prenet dropout on even at inference)."""
    mods = _modules(d)
    k_pre, k_zo1, k_zo2 = jax.random.split(rng, 3)

    from rtvc_tpu.ops.precision import matmul_dtype

    cdt = matmul_dtype()
    if prenet_dropout:
        prenet_out = mods["dec_prenet"].apply(
            {"params": params["dec_prenet"]}, prenet_in, rngs={"dropout": k_pre}
        )
    else:
        prenet_out = _prenet_nodrop(params["dec_prenet"], prenet_in, cdt)

    # Attention GRU input projection (context_vec is carried f32; cast down
    # so the concat stays in the compute dtype under the bf16 policy)
    attn_rnn_in = jnp.concatenate(
        [carry.context_vec.astype(prenet_out.dtype), prenet_out], axis=-1
    )
    xg = (
        jnp.dot(attn_rnn_in, params["attn_rnn"]["weight_ih"].T,
                preferred_element_type=cdt)
        + params["attn_rnn"]["bias_ih"]
    )
    new_carry, x, scores = _decoder_recurrence(
        params, d, carry, xg, encoder_seq, encoder_seq_proj, char_mask,
        k_zo1, k_zo2, train,
    )

    mels = mods["mel_proj"].apply({"params": params["mel_proj"]}, x)
    mels = mels.reshape(-1, d.n_mels, d.max_r)[:, :, :r]

    s = jnp.concatenate([x, new_carry.context_vec], axis=1)
    stop = jax.nn.sigmoid(
        mods["stop_proj"].apply({"params": params["stop_proj"]}, s)
    )
    return new_carry, mels, scores, stop


def _postnet(
    variables: Dict,
    d: TacotronDims,
    mels: jax.Array,
    train: bool,
    rng,
    lengths=None,
):
    """CBHG postnet + linear projection. ``mels`` is (B, n_mels, L).

    ``lengths`` gives length-exact semantics on a padded buffer — the
    reference generate runs the postnet on exactly the frames decoded
    before the stop token fired (ref tacotron.py:436-441), so frames past
    the stop point must not leak into valid ones through the CBHG BiGRU."""
    mods = _modules(d)
    rngs = {"dropout": rng} if rng is not None else None
    x = jnp.swapaxes(mels, 1, 2)  # (B, L, n_mels)
    new_stats = {}
    if train:
        post, upd = _apply(
            mods, variables, "postnet", x, train=True, rngs=rngs,
            mutable=["batch_stats"],
        )
        new_stats["postnet"] = upd["batch_stats"]
    else:
        post = _apply(
            mods, variables, "postnet", x, train=False, rngs=rngs,
            lengths=lengths,
        )
    linear = _apply(mods, variables, "post_proj", post)  # (B, L, fft_bins)
    return linear, new_stats


def _hoisted_outputs(variables, d, params, mods, x_all, ctx_all, attn, r,
                     n_iters, B, steps, train, k_post, new_stats, cdt):
    """Shared tail of the hoisted/fused train paths: output projections
    over the stacked decoder states (one big matmul each — mel_proj keeps
    only columns j with j % max_r < r, slicing the weight rows instead of
    computing-then-discarding), then reshape + postnet."""
    keep = (
        jnp.arange(d.n_mels)[:, None] * d.max_r + jnp.arange(r)
    ).reshape(-1)
    w_mel = params["mel_proj"]["weight"][keep]  # (n_mels*r, lstm_dims)
    mel_steps = jnp.dot(
        x_all, w_mel.T, preferred_element_type=cdt
    ).reshape(n_iters, B, d.n_mels, r)
    stop_in = jnp.concatenate([x_all, ctx_all.astype(x_all.dtype)], -1)
    stops = jax.nn.sigmoid(
        mods["stop_proj"].apply({"params": params["stop_proj"]}, stop_in)
    )  # (n_iters, B, 1)
    mel_out = jnp.moveaxis(mel_steps, 0, 2).reshape(B, d.n_mels, steps)
    attn = jnp.swapaxes(attn, 0, 1)  # (B, n_iters, T_text)
    stop_out = jnp.repeat(jnp.swapaxes(stops[..., 0], 0, 1), r, axis=1)
    linear, post_stats = _postnet(variables, d, mel_out, train, k_post)
    linear = jnp.swapaxes(linear, 1, 2)
    new_stats.update(post_stats)
    return mel_out, linear, attn, stop_out, new_stats


def tacotron_forward(
    variables: Dict,
    d: TacotronDims,
    chars: jax.Array,
    mels: jax.Array,
    speaker_embedding: jax.Array,
    r: int,
    rng: jax.Array,
    train: bool = True,
    prenet_dropout: bool = True,
    hoisted: bool | None = None,
    fused: bool | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, Dict]:
    """Teacher-forced pass (ref: tacotron.py:335-391).

    chars (B, T_text) int32; mels (B, n_mels, steps) with steps % r == 0.
    Returns (mel_out (B, n_mels, steps), linear (B, fft_bins, steps),
    attn (B, steps//r, T_text), stop (B, steps), new_batch_stats).

    ``hoisted=True`` (default) moves everything that does not depend on the
    recurrent state out of the decoder scan: the prenet runs over ALL
    teacher frames as one batched pass (its inputs are fully known under
    teacher forcing), the prenet-side half of the attention-GRU input
    projection becomes one large matmul, and the mel/stop output
    projections are applied to the stacked decoder states after the scan —
    with the mel projection sliced to the ``r`` columns actually kept
    (the per-step path computes all ``max_r`` frames and discards
    ``max_r - r`` of them, ref: tacotron.py:370-373). Only the attention
    and the three RNN cells stay serial. The math is identical (up to
    float summation order); ``hoisted=False`` keeps the per-step oracle
    path the equivalence tests compare against. RNG layout for the prenet
    dropout differs between the two paths (one batched draw vs per-step
    draws — identically distributed either way). Default comes from env
    ``RTVC_TACO_HOIST`` (unset/1 = hoisted) so bench ablations can flip
    the path per process.
    """
    if hoisted is None:
        import os

        hoisted = os.environ.get("RTVC_TACO_HOIST", "1") != "0"
    B, _, steps = mels.shape
    k_enc, k_dec, k_post, k_pre_all = jax.random.split(rng, 4)
    encoder_seq, encoder_seq_proj, new_stats = encode(
        variables, d, chars, speaker_embedding, train=train, rng=k_enc
    )
    char_mask = (chars != 0).astype(jnp.float32)
    params = variables["params"]
    mods = _modules(d)

    n_iters = steps // r
    # Teacher inputs: frame t-1 for t = 0, r, 2r, ... (GO frame at t=0)
    go = jnp.zeros((B, d.n_mels), dtype=mels.dtype)
    teacher_idx = jnp.arange(1, n_iters) * r - 1
    teacher = jnp.concatenate(
        [go[:, None, :], jnp.moveaxis(mels[:, :, teacher_idx], 1, 2)], axis=1
    )  # (B, n_iters, n_mels)

    carry0 = init_decoder_carry(d, B, chars.shape[1], dtype=mels.dtype)
    step_keys = jax.random.split(k_dec, n_iters)

    from rtvc_tpu.ops.scanning import scan_unroll

    if hoisted:
        from rtvc_tpu.ops.precision import matmul_dtype

        cdt = matmul_dtype()
        if prenet_dropout:
            prenet_all = mods["dec_prenet"].apply(
                {"params": params["dec_prenet"]}, teacher,
                rngs={"dropout": k_pre_all},
            )  # (B, n_iters, 2*decoder_dims)
        else:
            prenet_all = _prenet_nodrop(params["dec_prenet"], teacher, cdt)

        # Split the attention-GRU input projection along its concat
        # boundary [context | prenet]: the prenet half (+ bias) hoists to
        # one big MXU matmul; the context half stays in the scan.
        w_ih = params["attn_rnn"]["weight_ih"]  # (3H, ctx + 2*decoder_dims)
        ctx_dim = encoder_seq.shape[-1]
        xg_pre = (
            jnp.dot(prenet_all, w_ih[:, ctx_dim:].T,
                    preferred_element_type=cdt)
            + params["attn_rnn"]["bias_ih"]
        )  # (B, n_iters, 3H)
        w_ctx_t = w_ih[:, :ctx_dim].T

        # Fused Pallas decoder chain (weights VMEM-resident across all
        # steps; custom VJP — ops/pallas/tacotron_train_kernel.py).
        # Opt-in via RTVC_FUSED_TACO_TRAIN=1: at the production shape the
        # VMEM-forced batch tiling loses to this hoisted scan 0.52×
        # (measured keep-or-kill, BENCHMARKS.md round-5 lever table).
        if fused is None:
            from rtvc_tpu.ops.pallas import tacotron_train_kernel as ttk

            fused = ttk.fused_ok(d, ctx_dim)
        if fused:
            from rtvc_tpu.ops.pallas.tacotron_train_kernel import (
                prepare_train_weights,
                taco_decoder_train_fused,
            )

            L_ = d.lstm_dims
            if train and _ZONEOUT_P > 0:
                kz1, kz2 = jax.random.split(k_dec)
                zo1 = jax.random.bernoulli(
                    kz1, _ZONEOUT_P, (n_iters, B, L_)
                ).astype(jnp.float32)
                zo2 = jax.random.bernoulli(
                    kz2, _ZONEOUT_P, (n_iters, B, L_)
                ).astype(jnp.float32)
            else:
                zo1 = zo2 = jnp.zeros((n_iters, B, L_), jnp.float32)
            prepared = prepare_train_weights(params, d, ctx_dim)
            x_all, ctx_all, attn = taco_decoder_train_fused(
                prepared, jnp.swapaxes(xg_pre, 0, 1), encoder_seq,
                encoder_seq_proj, char_mask, jnp.zeros_like(char_mask),
                zo1, zo2,
            )
            return _hoisted_outputs(
                variables, d, params, mods, x_all, ctx_all, attn, r,
                n_iters, B, steps, train, k_post, new_stats, cdt,
            )

        def body(carry, inp):
            xg_p, key = inp
            _, k_zo1, k_zo2 = jax.random.split(key, 3)
            xg = xg_p + jnp.dot(
                carry.context_vec.astype(xg_p.dtype), w_ctx_t,
                preferred_element_type=cdt,
            )
            carry, x, scores = _decoder_recurrence(
                params, d, carry, xg, encoder_seq, encoder_seq_proj,
                char_mask, k_zo1, k_zo2, train,
            )
            return carry, (x, carry.context_vec, scores)

        _, (x_all, ctx_all, attn) = jax.lax.scan(
            body, carry0, (jnp.swapaxes(xg_pre, 0, 1), step_keys),
            unroll=scan_unroll(),
        )
        return _hoisted_outputs(
            variables, d, params, mods, x_all, ctx_all, attn, r,
            n_iters, B, steps, train, k_post, new_stats, cdt,
        )
    else:
        def body(carry, inp):
            prenet_in, key = inp
            carry, m, scores, stop = decoder_step(
                params, d, r, carry, prenet_in, encoder_seq,
                encoder_seq_proj, char_mask, key, train,
                prenet_dropout=prenet_dropout,
            )
            return carry, (m, scores, stop)

        _, (mel_steps, attn, stops) = jax.lax.scan(
            body, carry0, (jnp.swapaxes(teacher, 0, 1), step_keys),
            unroll=scan_unroll(),
        )
    # mel_steps: (n_iters, B, n_mels, r) → (B, n_mels, steps)
    mel_out = jnp.moveaxis(mel_steps, 0, 2).reshape(B, d.n_mels, steps)
    attn = jnp.swapaxes(attn, 0, 1)  # (B, n_iters, T_text)
    stop_out = jnp.repeat(jnp.swapaxes(stops[..., 0], 0, 1), r, axis=1)  # (B, steps)

    linear, post_stats = _postnet(variables, d, mel_out, train, k_post)
    linear = jnp.swapaxes(linear, 1, 2)
    new_stats.update(post_stats)
    return mel_out, linear, attn, stop_out, new_stats


def tacotron_generate(
    variables: Dict,
    d: TacotronDims,
    chars: jax.Array,
    speaker_embedding: jax.Array,
    r: int,
    rng: jax.Array,
    max_steps: int = 2000,
    compute_linear: bool = False,
    prenet_dropout: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array, jax.Array]:
    """Autoregressive generation with data-dependent stopping
    (ref: tacotron.py:393-450).

    Returns (mel (B, n_mels, max_steps), linear or None, attn
    (B, max_steps//r, T_text), n_valid_steps scalar). The mel buffer is valid
    up to ``n_valid_steps``; the caller trims host-side (static shapes under
    jit).
    """
    B, T = chars.shape
    k_enc, k_dec, k_post = jax.random.split(rng, 3)
    encoder_seq, encoder_seq_proj, _ = encode(
        variables, d, chars, speaker_embedding, train=False, rng=k_enc
    )
    char_mask = (chars != 0).astype(jnp.float32)
    params = variables["params"]

    max_iters = max_steps // r
    mel_buf = jnp.zeros((B, d.n_mels, max_iters * r))
    attn_buf = jnp.zeros((B, max_iters, T))

    def cond(state):
        i, _, _, _, _, done = state
        return jnp.logical_and(i < max_iters, jnp.logical_not(done))

    def body(state):
        i, carry, prev_frame, mel_buf, attn_buf, _ = state
        key = jax.random.fold_in(k_dec, i)
        carry, m, scores, stop = decoder_step(
            params, d, r, carry, prev_frame, encoder_seq, encoder_seq_proj,
            char_mask, key, False, prenet_dropout=prenet_dropout,
        )
        mel_buf = jax.lax.dynamic_update_slice(mel_buf, m, (0, 0, i * r))
        attn_buf = jax.lax.dynamic_update_slice(
            attn_buf, scores[:, None, :], (0, i, 0)
        )
        # Stop when every stop token exceeds 0.5 after step 10
        # (ref: tacotron.py:434).
        done = jnp.logical_and(jnp.all(stop > 0.5), i * r > 10)
        return (i + 1, carry, m[:, :, -1], mel_buf, attn_buf, done)

    carry0 = init_decoder_carry(d, B, T)
    go = jnp.zeros((B, d.n_mels))
    i_final, _, _, mel_buf, attn_buf, _ = jax.lax.while_loop(
        cond, body, (0, carry0, go, mel_buf, attn_buf, jnp.asarray(False))
    )

    linear = None
    n_valid = i_final * r
    if compute_linear:
        # Length-exact postnet: the reference computes it over exactly the
        # n_valid decoded frames (ref tacotron.py:436-441); mask so the
        # undecoded tail of the static buffer can't bleed in.
        lin, _ = _postnet(
            variables, d, mel_buf, False, k_post,
            lengths=jnp.full((B,), n_valid),
        )
        linear = jnp.swapaxes(lin, 1, 2)
    return mel_buf, linear, attn_buf, n_valid


# ---------------------------------------------------------------------------
# Torch checkpoint import
# ---------------------------------------------------------------------------

_CBHG_KEYMAP = {
    # torch name fragment → our flax param path inside a CBHG tree
}


def _import_cbhg(sd: dict, prefix: str, K: int, num_highways: int) -> dict:
    def arr(name):
        return jnp.asarray(np.asarray(sd[prefix + name]), dtype=jnp.float32)

    out: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(K):
        out[f"conv1d_bank_{i}"] = {
            "conv": {"weight": arr(f"conv1d_bank.{i}.conv.weight")},
            "bnorm": {
                "weight": arr(f"conv1d_bank.{i}.bnorm.weight"),
                "bias": arr(f"conv1d_bank.{i}.bnorm.bias"),
            },
        }
        stats[f"conv1d_bank_{i}"] = {
            "bnorm": {
                "running_mean": arr(f"conv1d_bank.{i}.bnorm.running_mean"),
                "running_var": arr(f"conv1d_bank.{i}.bnorm.running_var"),
            }
        }
    for proj in ("conv_project1", "conv_project2"):
        out[proj] = {
            "conv": {"weight": arr(f"{proj}.conv.weight")},
            "bnorm": {
                "weight": arr(f"{proj}.bnorm.weight"),
                "bias": arr(f"{proj}.bnorm.bias"),
            },
        }
        stats[proj] = {
            "bnorm": {
                "running_mean": arr(f"{proj}.bnorm.running_mean"),
                "running_var": arr(f"{proj}.bnorm.running_var"),
            }
        }
    if prefix + "pre_highway.weight" in sd:
        out["pre_highway"] = {"weight": arr("pre_highway.weight")}
    for i in range(num_highways):
        out[f"highways_{i}"] = {
            "W1": {
                "weight": arr(f"highways.{i}.W1.weight"),
                "bias": arr(f"highways.{i}.W1.bias"),
            },
            "W2": {
                "weight": arr(f"highways.{i}.W2.weight"),
                "bias": arr(f"highways.{i}.W2.bias"),
            },
        }
    rnn = {}
    for suffix in ("", "_reverse"):
        for nm in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
            rnn[nm + suffix] = arr(f"rnn.{nm}{suffix}")
    out["rnn"] = rnn
    return {"params": out, "batch_stats": stats}


def import_torch_state(sd: dict, d: TacotronDims) -> Dict[str, Any]:
    """Reference Tacotron ``model_state`` → our variables tree
    (names per ref: tacotron.py:12-316)."""

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]), dtype=jnp.float32)

    def cell(prefix):
        return {
            "weight_ih": arr(prefix + ".weight_ih"),
            "weight_hh": arr(prefix + ".weight_hh"),
            "bias_ih": arr(prefix + ".bias_ih"),
            "bias_hh": arr(prefix + ".bias_hh"),
        }

    enc_cbhg = _import_cbhg(sd, "encoder.cbhg.", d.encoder_K, d.num_highways)
    postnet = _import_cbhg(sd, "postnet.", d.postnet_K, d.num_highways)

    params: Dict[str, Any] = {
        "embedding": {"weight": arr("encoder.embedding.weight")},
        "enc_prenet": {
            "fc1": {
                "weight": arr("encoder.pre_net.fc1.weight"),
                "bias": arr("encoder.pre_net.fc1.bias"),
            },
            "fc2": {
                "weight": arr("encoder.pre_net.fc2.weight"),
                "bias": arr("encoder.pre_net.fc2.bias"),
            },
        },
        "enc_cbhg": enc_cbhg["params"],
        "encoder_proj": {"weight": arr("encoder_proj.weight")},
        "dec_prenet": {
            "fc1": {
                "weight": arr("decoder.prenet.fc1.weight"),
                "bias": arr("decoder.prenet.fc1.bias"),
            },
            "fc2": {
                "weight": arr("decoder.prenet.fc2.weight"),
                "bias": arr("decoder.prenet.fc2.bias"),
            },
        },
        "lsa_conv": {
            "weight": arr("decoder.attn_net.conv.weight"),
            "bias": arr("decoder.attn_net.conv.bias"),
        },
        "lsa_L": {"weight": arr("decoder.attn_net.L.weight")},
        "lsa_W": {
            "weight": arr("decoder.attn_net.W.weight"),
            "bias": arr("decoder.attn_net.W.bias"),
        },
        "lsa_v": {"weight": arr("decoder.attn_net.v.weight")},
        "attn_rnn": cell("decoder.attn_rnn"),
        "rnn_input": {
            "weight": arr("decoder.rnn_input.weight"),
            "bias": arr("decoder.rnn_input.bias"),
        },
        "res_rnn1": cell("decoder.res_rnn1"),
        "res_rnn2": cell("decoder.res_rnn2"),
        "mel_proj": {"weight": arr("decoder.mel_proj.weight")},
        "stop_proj": {
            "weight": arr("decoder.stop_proj.weight"),
            "bias": arr("decoder.stop_proj.bias"),
        },
        "postnet": postnet["params"],
        "post_proj": {"weight": arr("post_proj.weight")},
    }
    stats = {
        "enc_cbhg": enc_cbhg["batch_stats"],
        "postnet": postnet["batch_stats"],
    }
    return {"params": params, "batch_stats": stats}
