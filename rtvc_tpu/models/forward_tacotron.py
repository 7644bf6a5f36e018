"""ForwardTacotron (non-autoregressive synthesizer) — TPU-native rebuild.

Architecture parity with the reference (ref: synthesizer/models/
forward_tacotron.py): three conv+BiGRU ``SeriesPredictor``s (duration/pitch/
energy) conditioned on concat(char embedding, speaker embedding)
(:15-44); CBHG prenet (common-layers variant); pitch/energy 1-D conv
projections added with configurable strength; LengthRegulator; per-char
speaker concat; packed BiLSTM → mel head; CBHG postnet (:132-260).

TPU-native design:
  * fully parallel forward — no sequential decode; every projection is a
    batched MXU matmul;
  * LengthRegulator is the static-shape cumsum/gather formulation;
  * torch's ``pack_padded_sequence`` BiLSTM becomes a per-example
    length-reversal (gather) around a plain ``lax.scan`` BiLSTM, with
    padding positions forced to ``padding_value`` — identical semantics,
    static shapes;
  * generation is two jits: a cheap predictor pass, then mel synthesis at a
    host-bucketed max length (durations are data-dependent; the bucket keeps
    compiled shapes finite).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.config.synthesizer import ForwardTacotronParams
from rtvc_tpu.models.layers import CBHG, BatchNormConv, Conv1d, Embedding, Linear


class ForwardTacotronDims(NamedTuple):
    num_chars: int
    n_mels: int
    speaker_embedding_size: int
    embed_dims: int
    series_embed_dims: int
    duration_conv_dims: int
    duration_rnn_dims: int
    duration_dropout: float
    pitch_conv_dims: int
    pitch_rnn_dims: int
    pitch_dropout: float
    pitch_strength: float
    energy_conv_dims: int
    energy_rnn_dims: int
    energy_dropout: float
    energy_strength: float
    prenet_dims: int
    prenet_k: int
    prenet_num_highways: int
    prenet_dropout: float
    rnn_dims: int
    postnet_dims: int
    postnet_k: int
    postnet_num_highways: int
    postnet_dropout: float
    padding_value: float

    @classmethod
    def from_config(
        cls, cfg: ForwardTacotronParams, num_chars: int, n_mels: int, spk: int
    ) -> "ForwardTacotronDims":
        return cls(
            num_chars=num_chars,
            n_mels=n_mels,
            speaker_embedding_size=spk,
            embed_dims=cfg.embed_dims,
            series_embed_dims=cfg.series_embed_dims,
            duration_conv_dims=cfg.duration_conv_dims,
            duration_rnn_dims=cfg.duration_rnn_dims,
            duration_dropout=cfg.duration_dropout,
            pitch_conv_dims=cfg.pitch_conv_dims,
            pitch_rnn_dims=cfg.pitch_rnn_dims,
            pitch_dropout=cfg.pitch_dropout,
            pitch_strength=cfg.pitch_strength,
            energy_conv_dims=cfg.energy_conv_dims,
            energy_rnn_dims=cfg.energy_rnn_dims,
            energy_dropout=cfg.energy_dropout,
            energy_strength=cfg.energy_strength,
            prenet_dims=cfg.prenet_dims,
            prenet_k=cfg.prenet_k,
            prenet_num_highways=cfg.prenet_num_highways,
            prenet_dropout=cfg.prenet_dropout,
            rnn_dims=cfg.rnn_dims,
            postnet_dims=cfg.postnet_dims,
            postnet_k=cfg.postnet_k,
            postnet_num_highways=cfg.postnet_num_highways,
            postnet_dropout=cfg.postnet_dropout,
            padding_value=-11.5129,  # log(1e-5) mel floor (ref ctor default)
        )


def _mm(x, w):
    from rtvc_tpu.ops.precision import matmul_dtype

    return jnp.dot(x, w, preferred_element_type=matmul_dtype())


# ---------------------------------------------------------------------------
# Module builders
# ---------------------------------------------------------------------------


def _series_modules(d: ForwardTacotronDims, conv_dims: int, rnn_dims: int):
    from rtvc_tpu.models.layers import GRU

    return {
        "embedding": Embedding(d.num_chars, d.series_embed_dims),
        "convs_0": BatchNormConv(conv_dims, 5),
        "convs_1": BatchNormConv(conv_dims, 5),
        "convs_2": BatchNormConv(conv_dims, 5),
        "rnn": GRU(rnn_dims, bidirectional=True),
        "lin": Linear(1),
    }


def _modules(d: ForwardTacotronDims) -> Dict[str, Any]:
    return {
        "embedding": Embedding(d.num_chars, d.embed_dims),
        "prenet": CBHG(
            K=d.prenet_k,
            in_channels=d.embed_dims,
            channels=d.prenet_dims,
            proj_channels=(d.prenet_dims, d.embed_dims),
            num_highways=d.prenet_num_highways,
            forward_variant=True,
            dropout_rate=d.prenet_dropout,
        ),
        "lin": Linear(d.n_mels),
        "postnet": CBHG(
            K=d.postnet_k,
            in_channels=d.n_mels,
            channels=d.postnet_dims,
            proj_channels=(d.postnet_dims, d.n_mels),
            num_highways=d.postnet_num_highways,
            forward_variant=True,
            dropout_rate=d.postnet_dropout,
        ),
        "post_proj": Linear(d.n_mels, use_bias=False),
        "pitch_proj": Conv1d(2 * d.prenet_dims, 3, padding=1),
        "energy_proj": Conv1d(2 * d.prenet_dims, 3, padding=1),
    }


def init_forward_tacotron(key: jax.Array, d: ForwardTacotronDims) -> Dict[str, Any]:
    """Initialize {'params', 'batch_stats'} (xavier on >1-D tensors, matching
    the reference init, ref: forward_tacotron.py:300-303)."""
    import zlib

    mods = _modules(d)
    keys = jax.random.split(key, 32)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    B, T = 1, 8
    rngs = lambda k: {"params": k, "dropout": jax.random.fold_in(k, 1)}

    def init_named(tree_p, tree_s, name, mod, k, *args, **kw):
        v = mod.init(rngs(k), *args, **kw)
        tree_p[name] = v["params"]
        if "batch_stats" in v:
            tree_s[name] = v["batch_stats"]

    # Series predictors
    for i, (nm, conv_dims, rnn_dims, dropout) in enumerate(
        (
            ("dur_pred", d.duration_conv_dims, d.duration_rnn_dims, d.duration_dropout),
            ("pitch_pred", d.pitch_conv_dims, d.pitch_rnn_dims, d.pitch_dropout),
            ("energy_pred", d.energy_conv_dims, d.energy_rnn_dims, d.energy_dropout),
        )
    ):
        smods = _series_modules(d, conv_dims, rnn_dims)
        sp: Dict[str, Any] = {}
        ss: Dict[str, Any] = {}
        k0 = jax.random.fold_in(keys[0], i)
        init_named(sp, ss, "embedding", smods["embedding"],
                   jax.random.fold_in(k0, 0), jnp.zeros((B, T), jnp.int32))
        cin = d.series_embed_dims + d.speaker_embedding_size
        init_named(sp, ss, "convs_0", smods["convs_0"],
                   jax.random.fold_in(k0, 1), jnp.zeros((B, T, cin)))
        init_named(sp, ss, "convs_1", smods["convs_1"],
                   jax.random.fold_in(k0, 2), jnp.zeros((B, T, conv_dims)))
        init_named(sp, ss, "convs_2", smods["convs_2"],
                   jax.random.fold_in(k0, 3), jnp.zeros((B, T, conv_dims)))
        init_named(sp, ss, "rnn", smods["rnn"],
                   jax.random.fold_in(k0, 4), jnp.zeros((B, T, conv_dims)))
        init_named(sp, ss, "lin", smods["lin"],
                   jax.random.fold_in(k0, 5), jnp.zeros((B, T, 2 * rnn_dims)))
        params[nm] = sp
        stats[nm] = ss

    mp: Dict[str, Any] = {}
    ms: Dict[str, Any] = {}
    init_named(mp, ms, "embedding", mods["embedding"], keys[1],
               jnp.zeros((B, T), jnp.int32))
    init_named(mp, ms, "prenet", mods["prenet"], keys[2],
               jnp.zeros((B, T, d.embed_dims)))
    lstm_in = 2 * d.prenet_dims + d.speaker_embedding_size
    init_named(mp, ms, "lin", mods["lin"], keys[3],
               jnp.zeros((B, T, 2 * d.rnn_dims)))
    init_named(mp, ms, "postnet", mods["postnet"], keys[4],
               jnp.zeros((B, T, d.n_mels)))
    init_named(mp, ms, "post_proj", mods["post_proj"], keys[5],
               jnp.zeros((B, T, 2 * d.postnet_dims)))
    init_named(mp, ms, "pitch_proj", mods["pitch_proj"], keys[6],
               jnp.zeros((B, T, 1)))
    init_named(mp, ms, "energy_proj", mods["energy_proj"], keys[7],
               jnp.zeros((B, T, 1)))
    params.update(mp)
    stats.update(ms)

    # Bi-LSTM (torch layout)
    H = d.rnn_dims
    s = 1.0 / np.sqrt(H)
    lstm = {}
    for j, suffix in enumerate(("", "_reverse")):
        ks = jax.random.split(jax.random.fold_in(keys[8], j), 4)
        u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -s, s)
        lstm[f"weight_ih_l0{suffix}"] = u(ks[0], (4 * H, lstm_in))
        lstm[f"weight_hh_l0{suffix}"] = u(ks[1], (4 * H, H))
        lstm[f"bias_ih_l0{suffix}"] = u(ks[2], (4 * H,))
        lstm[f"bias_hh_l0{suffix}"] = u(ks[3], (4 * H,))
    params["lstm"] = lstm

    # Xavier re-init on all >1-D tensors (deterministic per-path keys)
    leaves_key = keys[9]

    def xavier(path_key, x):
        if x.ndim > 1:
            limit = np.sqrt(6.0 / (x.shape[-1] + x.shape[-2]))
            k = jax.random.fold_in(leaves_key, zlib.crc32(path_key.encode()) % (2**31))
            return jax.random.uniform(k, x.shape, x.dtype, -limit, limit)
        return x

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    params = jax.tree_util.tree_unflatten(
        treedef, [xavier(jax.tree_util.keystr(p), v) for p, v in flat]
    )
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _apply(mod, params, stats, name, *args, rngs=None, train=None, mutable=False):
    v = {"params": params[name]}
    if name in stats:
        v["batch_stats"] = stats[name]
    kw = {}
    if train is not None:
        kw["train"] = train
    return mod.apply(v, *args, rngs=rngs, mutable=mutable, **kw)


def series_predictor(
    d: ForwardTacotronDims,
    name: str,
    conv_dims: int,
    rnn_dims: int,
    dropout: float,
    params: Dict,
    stats: Dict,
    x: jax.Array,
    spk_emb: jax.Array,
    alpha: float = 1.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict]:
    """Conv×3 + BiGRU + Linear head (ref: forward_tacotron.py:15-44).
    Returns ((B, T, 1) prediction, new_stats)."""
    mods = _series_modules(d, conv_dims, rnn_dims)
    p, s = params[name], stats[name]
    rngs = {"dropout": rng} if rng is not None else None
    new_s: Dict[str, Any] = dict(s)

    h = mods["embedding"].apply({"params": p["embedding"]}, x)
    spk = jnp.broadcast_to(
        spk_emb[:, None, :], (h.shape[0], h.shape[1], spk_emb.shape[-1])
    )
    h = jnp.concatenate([h, spk], axis=2)
    for i in range(3):
        nm = f"convs_{i}"
        if train:
            h, upd = mods[nm].apply(
                {"params": p[nm], "batch_stats": s[nm]}, h, train=True,
                mutable=["batch_stats"],
            )
            new_s[nm] = upd["batch_stats"]
            if rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout), 0.0)
        else:
            h = mods[nm].apply({"params": p[nm], "batch_stats": s[nm]}, h, train=False)
    h, _ = mods["rnn"].apply({"params": p["rnn"]}, h)
    out = mods["lin"].apply({"params": p["lin"]}, h)
    return out / alpha, new_s


def _lstm_dir(p: Dict, suffix: str, x: jax.Array) -> jax.Array:
    """One direction of the torch-layout BiLSTM: input projection hoisted
    to one MXU matmul, then the fused Pallas sequence kernel on TPU
    (W_hh VMEM-resident for the whole sequence, custom VJP) with the
    lax.scan recurrence as the oracle/fallback path."""
    w_ih = p[f"weight_ih_l0{suffix}"]
    w_hh = p[f"weight_hh_l0{suffix}"]
    b = p[f"bias_ih_l0{suffix}"] + p[f"bias_hh_l0{suffix}"]
    B = x.shape[0]
    H = w_hh.shape[1]
    xg = _mm(x, w_ih.T) + b
    w_hh_t = w_hh.T

    from rtvc_tpu.ops.pallas.lstm_train_kernel import fused_ok, lstm_seq_fused

    if fused_ok(B, H, xg.dtype):
        zeros = jnp.zeros((B, H), xg.dtype)
        ys, _, _ = lstm_seq_fused(w_hh_t, xg, zeros, zeros,
                                  jax.default_backend() != "tpu")
        return ys

    def step(carry, xg_t):
        h, c = carry
        gates = xg_t + _mm(h, w_hh_t)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    from rtvc_tpu.ops.scanning import scan_unroll

    _, ys = jax.lax.scan(
        step,
        (jnp.zeros((B, H), xg.dtype), jnp.zeros((B, H), xg.dtype)),
        jnp.swapaxes(xg, 0, 1),
        unroll=scan_unroll(),
    )
    return jnp.swapaxes(ys, 0, 1)


def bilstm_packed(
    p: Dict, x: jax.Array, lens: jax.Array, padding_value: float
) -> jax.Array:
    """BiLSTM with torch pack_padded_sequence semantics, static shapes.

    The backward direction consumes each sequence reversed *by its own
    length* (gather), so padding never contaminates valid positions; output
    positions ≥ len are set to ``padding_value``
    (ref: forward_tacotron.py:168-173)."""
    B, T, _ = x.shape
    t_idx = jnp.arange(T)
    mask = t_idx[None, :] < lens[:, None]  # (B, T)

    fwd = _lstm_dir(p, "", x)

    rev_idx = jnp.clip(lens[:, None] - 1 - t_idx[None, :], 0, T - 1)
    x_rev = jnp.take_along_axis(x, rev_idx[..., None], axis=1)
    x_rev = jnp.where(mask[..., None], x_rev, 0.0)
    bwd_rev = _lstm_dir(p, "_reverse", x_rev)
    bwd = jnp.take_along_axis(bwd_rev, rev_idx[..., None], axis=1)

    out = jnp.concatenate([fwd, bwd], axis=-1)
    return jnp.where(mask[..., None], out, padding_value)


def _mel_synthesis(
    params: Dict,
    stats: Dict,
    d: ForwardTacotronDims,
    x: jax.Array,
    spk_emb: jax.Array,
    durations: jax.Array,
    pitch: jax.Array,
    energy: jax.Array,
    max_len: int,
    mel_lens: jax.Array,
    train: bool,
    rng: Optional[jax.Array],
    exact_lengths: bool = False,
) -> Tuple[jax.Array, jax.Array, Dict]:
    """Shared trunk: embedding → prenet → ±pitch/energy proj → LR → spk concat
    → packed BiLSTM → mel head → postnet (ref: forward_tacotron.py:139-183,
    225-260). pitch/energy: (B, T_text, 1). Returns (mel, mel_post, stats)."""
    from rtvc_tpu.models.layers import LengthRegulator

    mods = _modules(d)
    rngs = {"dropout": rng} if rng is not None else None
    new_stats: Dict[str, Any] = {}

    h = mods["embedding"].apply({"params": params["embedding"]}, x)
    if train:
        h, upd = mods["prenet"].apply(
            {"params": params["prenet"], "batch_stats": stats["prenet"]},
            h, train=True, rngs=rngs, mutable=["batch_stats"],
        )
        new_stats["prenet"] = upd["batch_stats"]
    else:
        h = mods["prenet"].apply(
            {"params": params["prenet"], "batch_stats": stats["prenet"]},
            h, train=False, rngs=rngs,
        )

    pitch_proj = mods["pitch_proj"].apply({"params": params["pitch_proj"]}, pitch)
    h = h + pitch_proj * d.pitch_strength
    energy_proj = mods["energy_proj"].apply({"params": params["energy_proj"]}, energy)
    h = h + energy_proj * d.energy_strength

    h = LengthRegulator().apply({"params": {}}, h, durations, max_len)

    spk = jnp.broadcast_to(
        spk_emb[:, None, :], (h.shape[0], max_len, spk_emb.shape[-1])
    )
    h = jnp.concatenate([h, spk], axis=2)

    h = bilstm_packed(params["lstm"], h, mel_lens, d.padding_value)
    mel = mods["lin"].apply({"params": params["lin"]}, h)  # (B, L, n_mels)

    if train:
        post, upd = mods["postnet"].apply(
            {"params": params["postnet"], "batch_stats": stats["postnet"]},
            mel, train=True, rngs=rngs, mutable=["batch_stats"],
        )
        new_stats["postnet"] = upd["batch_stats"]
    elif exact_lengths:
        # Generation runs the reference postnet on the UNPADDED sequence
        # (ref forward_tacotron.py:254-256); emulate that on our padded
        # buffer with length-masked CBHG semantics so the padded tail
        # (which holds lin(padding_value) garbage) cannot bleed into valid
        # frames through the postnet's backward GRU / convs.
        post = mods["postnet"].apply(
            {"params": params["postnet"], "batch_stats": stats["postnet"]},
            mel, train=False, rngs=rngs, lengths=mel_lens,
        )
    else:
        post = mods["postnet"].apply(
            {"params": params["postnet"], "batch_stats": stats["postnet"]},
            mel, train=False, rngs=rngs,
        )
    mel_post = mods["post_proj"].apply({"params": params["post_proj"]}, post)

    # NB: positions beyond each example's length hold lin(padding_value) —
    # exactly like the reference, which applies `lin` after pad_packed
    # (ref: forward_tacotron.py:170-175); masked losses ignore them.
    return jnp.swapaxes(mel, 1, 2), jnp.swapaxes(mel_post, 1, 2), new_stats


def forward_tacotron_forward(
    variables: Dict,
    d: ForwardTacotronDims,
    x: jax.Array,
    mel: jax.Array,
    dur: jax.Array,
    spk_emb: jax.Array,
    mel_lens: jax.Array,
    pitch: jax.Array,
    energy: jax.Array,
    rng: jax.Array,
    train: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, Dict]:
    """Training forward (ref: forward_tacotron.py:139-183). ``pitch``/
    ``energy`` are ground truth (B, T_text); ``dur`` ground-truth durations.
    Returns (mel_hat, mel_post, dur_hat, pitch_hat, energy_hat, new_stats)."""
    params, stats = variables["params"], variables["batch_stats"]
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    new_stats = dict(stats)

    dur_hat, s1 = series_predictor(
        d, "dur_pred", d.duration_conv_dims, d.duration_rnn_dims,
        d.duration_dropout, params, stats, x, spk_emb, train=train, rng=k1,
    )
    pitch_hat, s2 = series_predictor(
        d, "pitch_pred", d.pitch_conv_dims, d.pitch_rnn_dims,
        d.pitch_dropout, params, stats, x, spk_emb, train=train, rng=k2,
    )
    energy_hat, s3 = series_predictor(
        d, "energy_pred", d.energy_conv_dims, d.energy_rnn_dims,
        d.energy_dropout, params, stats, x, spk_emb, train=train, rng=k3,
    )
    new_stats.update({"dur_pred": s1, "pitch_pred": s2, "energy_pred": s3})

    mel_hat, mel_post, s4 = _mel_synthesis(
        params, stats, d, x, spk_emb,
        # same rounding as the reference LengthRegulator: negatives → 0,
        # (dur + 0.5) floor (ref: common_layers.py:12-16)
        jnp.maximum(jnp.floor(dur + 0.5), 0.0).astype(jnp.int32),
        pitch[..., None], energy[..., None],
        max_len=mel.shape[2], mel_lens=mel_lens, train=train, rng=k4,
    )
    new_stats.update(s4)
    # pitch_hat/energy_hat as (B, 1, T_text) to match the reference interface
    return (
        mel_hat,
        mel_post,
        dur_hat[..., 0],
        jnp.swapaxes(pitch_hat, 1, 2),
        jnp.swapaxes(energy_hat, 1, 2),
        new_stats,
    )


@functools.lru_cache(maxsize=8)
def _generate_jits(d: ForwardTacotronDims):
    """Jitted (predict, synth) pair cached per dims — defining them inside
    ``forward_generate`` re-traced every call (~1.4 s/utterance measured;
    the same bug class as the round-3 streaming fix)."""

    @jax.jit
    def _predict(variables, x, spk_emb):
        p, s = variables["params"], variables["batch_stats"]
        dur, _ = series_predictor(
            d, "dur_pred", d.duration_conv_dims, d.duration_rnn_dims,
            d.duration_dropout, p, s, x, spk_emb, alpha=1.0,
        )
        pitch, _ = series_predictor(
            d, "pitch_pred", d.pitch_conv_dims, d.pitch_rnn_dims,
            d.pitch_dropout, p, s, x, spk_emb,
        )
        energy, _ = series_predictor(
            d, "energy_pred", d.energy_conv_dims, d.energy_rnn_dims,
            d.energy_dropout, p, s, x, spk_emb,
        )
        return dur, pitch, energy

    @functools.partial(jax.jit, static_argnames=("max_len",))
    def _synth(variables, x, spk_emb, durations, pitch, energy, mel_lens,
               max_len):
        p, s = variables["params"], variables["batch_stats"]
        mel, mel_post, _ = _mel_synthesis(
            p, s, d, x, spk_emb, durations, pitch, energy,
            max_len=max_len, mel_lens=mel_lens, train=False, rng=None,
            exact_lengths=True,
        )
        return mel, mel_post

    return _predict, _synth


def forward_generate(
    variables: Dict,
    d: ForwardTacotronDims,
    x: jax.Array,
    spk_emb: jax.Array,
    rng: jax.Array,
    alpha: float = 1.0,
    pitch_function: Optional[Callable] = None,
    energy_function: Optional[Callable] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generation (ref: forward_tacotron.py:185-213): predict durations/pitch/
    energy, host-round durations, then synthesize at a bucketed max length.
    Returns (mel_post (B, n_mels, L), durations (B, T_text))."""
    _predict, _synth = _generate_jits(d)
    dur_hat, pitch_hat, energy_hat = _predict(variables, x, spk_emb)
    dur_hat = np.asarray(dur_hat)[..., 0] / alpha
    # pitch/energy functions receive (B, 1, T) like the reference
    # (ref: forward_tacotron.py:198-201)
    pitch_hat = np.swapaxes(np.asarray(pitch_hat), 1, 2)
    energy_hat = np.swapaxes(np.asarray(energy_hat), 1, 2)
    if pitch_function is not None:
        pitch_hat = np.asarray(pitch_function(pitch_hat))
    if energy_function is not None:
        energy_hat = np.asarray(energy_function(energy_hat))
    pitch_hat = np.swapaxes(pitch_hat, 1, 2)  # back to (B, T, 1)
    energy_hat = np.swapaxes(energy_hat, 1, 2)

    # Degenerate-duration guard, exactly like the reference
    # (forward_tacotron.py:194-195): the check TRUNCATES the raw float
    # predictions (dur_hat.long()), so a prediction of e.g. 0.9 per phoneme
    # counts as zero here even though the LengthRegulator below would round
    # it up to 1 — in that case every phoneme is forced to duration 2.0.
    if np.trunc(dur_hat).sum() <= 0:
        dur_hat = np.full_like(dur_hat, 2.0)
    # Round like the reference LengthRegulator ((dur+0.5).long(), negatives→0)
    durations = np.maximum(np.floor(dur_hat + 0.5), 0.0).astype(np.int32)
    mel_lens = durations.sum(axis=1)
    max_len = int(-(-int(mel_lens.max()) // 128) * 128)

    mel, mel_post = _synth(
        variables, x, spk_emb, jnp.asarray(durations),
        jnp.asarray(pitch_hat), jnp.asarray(energy_hat),
        jnp.asarray(mel_lens), max_len,
    )
    return np.asarray(mel_post), durations


# ---------------------------------------------------------------------------
# Torch checkpoint import
# ---------------------------------------------------------------------------


def import_torch_state(sd: dict, d: ForwardTacotronDims) -> Dict[str, Any]:
    """Reference ForwardTacotron ``model_state`` → our variables tree."""
    from rtvc_tpu.models.tacotron import _import_cbhg

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]), dtype=jnp.float32)

    def lin(prefix, bias=True):
        out = {"weight": arr(prefix + ".weight")}
        if bias and prefix + ".bias" in sd:
            out["bias"] = arr(prefix + ".bias")
        return out

    def series(prefix):
        p: Dict[str, Any] = {"embedding": {"weight": arr(prefix + ".embedding.weight")}}
        s: Dict[str, Any] = {}
        for i in range(3):
            p[f"convs_{i}"] = {
                "conv": {"weight": arr(f"{prefix}.convs.{i}.conv.weight")},
                "bnorm": {
                    "weight": arr(f"{prefix}.convs.{i}.bnorm.weight"),
                    "bias": arr(f"{prefix}.convs.{i}.bnorm.bias"),
                },
            }
            s[f"convs_{i}"] = {
                "bnorm": {
                    "running_mean": arr(f"{prefix}.convs.{i}.bnorm.running_mean"),
                    "running_var": arr(f"{prefix}.convs.{i}.bnorm.running_var"),
                }
            }
        p["rnn"] = {
            nm + suffix: arr(f"{prefix}.rnn.{nm}{suffix}")
            for nm in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")
            for suffix in ("", "_reverse")
        }
        p["lin"] = lin(prefix + ".lin")
        return p, s

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for nm in ("dur_pred", "pitch_pred", "energy_pred"):
        params[nm], stats[nm] = series(nm)

    params["embedding"] = {"weight": arr("embedding.weight")}
    prenet = _import_cbhg(sd, "prenet.", d.prenet_k, d.prenet_num_highways)
    params["prenet"], stats["prenet"] = prenet["params"], prenet["batch_stats"]
    postnet = _import_cbhg(sd, "postnet.", d.postnet_k, d.postnet_num_highways)
    params["postnet"], stats["postnet"] = postnet["params"], postnet["batch_stats"]

    params["lstm"] = {
        nm + suffix: arr(f"lstm.{nm}{suffix}")
        for nm in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")
        for suffix in ("", "_reverse")
    }
    params["lin"] = lin("lin")
    params["post_proj"] = lin("post_proj", bias=False)
    params["pitch_proj"] = lin("pitch_proj")
    params["energy_proj"] = lin("energy_proj")
    return {"params": params, "batch_stats": stats}
