"""Streaming voice cloning: time-to-first-audio far below utterance length.

The batch pipeline (``Synthesizer.synthesize_spectrograms`` →
``vocoder.infer_waveform``) only returns audio after the WHOLE mel is
decoded and vocoded. This module streams instead: the Tacotron decoder runs
in fixed-size chunks (a jitted ``lax.scan`` that carries the decoder state
across calls), each chunk is post-netted with left context and vocoded with
conditioning lookback, and waveform chunks are yielded with an equal-power
crossfade at the joins — first audio leaves the device after one chunk
(~0.6 s of speech) instead of after the full utterance.

This is the serving capability the reference's "real-time" name implies but
its implementation lacks (ref synthesizer/inference.py:79-162 and
vocoder/inference.py:59-95 are both whole-utterance calls; the only
streaming affordance is a progress callback).

Chunk-boundary quality rides on the same mechanism as fold joins: each
vocoder call includes ``voc_ctx`` frames of already-emitted conditioning so
the AR state warms up before the splice point, exactly like a fold window's
overlap region (ref fold: fatchord_version.py:290-340; join fidelity:
utils/genquality.py / BENCHMARKS.md quality table). The postnet (a
bidirectional CBHG) sees ``post_ctx`` raw frames of left context per chunk;
its missing right context at the live edge is the one approximation
streaming makes vs the batch path (tests/test_streaming.py bounds it).

TTFA instrumentation: every yielded ``StreamChunk`` carries a wall-clock
timestamp; ``bench_streaming.py`` reports TTFA on real hardware for
SERVING.md.
"""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _cached_encode(d):
    from rtvc_tpu.models import tacotron as taco

    @jax.jit
    def _encode(variables, chars, embeds, k):
        enc_seq, enc_proj, _ = taco.encode(
            variables, d, chars, embeds, train=False, rng=k
        )
        return enc_seq, enc_proj

    return _encode


@functools.lru_cache(maxsize=16)
def _make_post_vocode(d_syn, voc_dims, post_ctx: int, voc_ctx: int,
                      chunk_frames: int, voc_target: int, voc_overlap: int,
                      mu_law: bool, apply_preemphasis: bool, compute_dtype,
                      use_pallas: bool, stream_dtype, max_abs: float):
    """One jitted device chain per chunk shape: postnet over
    [raw context | chunk] → slice → concat vocoder context → the full
    WaveRNN generate pipeline. Keeping postnet+vocode in a single dispatch
    (and the context buffers on device) removes two host round-trips per
    chunk — through a remote runtime that is most of the steady-state
    chunk cadence."""
    from rtvc_tpu.models import tacotron as taco
    from rtvc_tpu.models.wavernn import _generate_pipeline

    @jax.jit
    def run(syn_variables, voc_variables, raw_hist, mel_chunk, post_hist,
            key, valid_frames):
        # (n_mels, post_ctx) ++ (n_mels, chunk) → postnet window.
        # ``valid_frames`` length-limits the CBHG: on the final chunk the
        # window carries silence-pad frames past the stop point, and the
        # postnet's backward GRU would bleed them into the kept frames —
        # the exact leak the batch path masks (models/tacotron.py:_postnet).
        win = jnp.concatenate([raw_hist, mel_chunk[0]], axis=1)[None]
        lengths = jnp.asarray([post_ctx + valid_frames], jnp.int32)
        lin, _ = taco._postnet(syn_variables, d_syn, win, False, None,
                               lengths=lengths)
        post = jnp.swapaxes(lin, 1, 2)[0]
        post_chunk = post[:, post_ctx:]
        cond = jnp.concatenate([post_hist, post_chunk], axis=1)
        wav = _generate_pipeline(
            voc_variables, voc_dims, cond[None] / max_abs, key,
            True, voc_target, voc_overlap, mu_law, apply_preemphasis,
            compute_dtype, use_pallas, stream_dtype,
        )
        w = post_ctx + chunk_frames
        new_raw = jnp.concatenate([raw_hist, mel_chunk[0]], axis=1)[
            :, w - post_ctx :
        ]
        new_post = cond[:, cond.shape[1] - voc_ctx :]
        return wav, new_raw, new_post

    return run


@dataclass
class StreamChunk:
    wav: np.ndarray          # float32 samples, crossfaded, ready to play
    index: int               # chunk number, 0-based
    final: bool              # True on the last chunk
    t_emitted: float         # time.perf_counter() when this chunk was ready


@functools.lru_cache(maxsize=16)
def _make_chunk_vocoder(voc_dims, window_frames: int, voc_target: int,
                        voc_overlap: int, mu_law: bool,
                        apply_preemphasis: bool, compute_dtype,
                        use_pallas: bool, stream_dtype, max_abs: float):
    """One jitted vocode dispatch per window shape: a (n_mels,
    window_frames) conditioning slice → the full WaveRNN generate pipeline
    ((window−1)·hop samples). The NAR streaming path's only device work —
    cached per shape so repeated streams never retrace."""
    from rtvc_tpu.models.wavernn import _generate_pipeline

    @jax.jit
    def run(voc_variables, cond, key):
        return _generate_pipeline(
            voc_variables, voc_dims, cond[None] / max_abs, key,
            True, voc_target, voc_overlap, mu_law, apply_preemphasis,
            compute_dtype, use_pallas, stream_dtype,
        )

    return run


def stream_vocode(
    voc_variables,
    voc_dims,
    mel: np.ndarray,
    seed: int = 0,
    chunk_frames: int = 48,
    voc_ctx: int = 12,
    xfade_frames: int = 2,
    voc_target: int = 400,
    voc_overlap: int = 160,
    use_pallas: Optional[bool] = None,
    stream_dtype=jnp.bfloat16,
    first_chunk_frames: Optional[int] = None,
    mu_law: Optional[bool] = None,
    apply_preemphasis: Optional[bool] = None,
    compute_dtype=jnp.float32,
    voc_config=None,
) -> Iterator[StreamChunk]:
    """Chunked vocoding of an ALREADY-COMPLETE mel (80, T): yields playable
    waveform chunks with ``voc_ctx`` frames of conditioning lookback before
    every splice (AR state warm-up, same mechanism as fold overlap — ref
    fatchord_version.py:290-340) and an equal-power crossfade at joins.

    This is the NAR streaming path: ForwardTacotron/FastPitch emit their
    whole mel in one parallel pass (ref forward_tacotron.py:185-204), so
    streaming them means streaming the vocoder — TTFA is one mel pass plus
    ONE SMALL chunk's vocode instead of the full utterance's. Also usable
    on any precomputed mel (the toolbox "vocode-only" path).

    Chunk waveforms total (T − 1)·hop samples, matching the batch
    ``vocoder.infer_waveform`` length for the same mel.
    """
    from rtvc_tpu.config import sp as _sp
    from rtvc_tpu.models.wavernn import MODE_RAW

    hop = voc_dims.hop_length
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if mu_law is None:
        mu_law = getattr(voc_config, "mu_law", True)
    mu_law = bool(mu_law) and voc_dims.mode == MODE_RAW
    if apply_preemphasis is None:
        apply_preemphasis = _sp.preemphasize
    xfade_frames = max(xfade_frames, 0)
    voc_ctx = max(voc_ctx, 1 + xfade_frames)  # same invariant as stream_clone
    chunk_frames = max(chunk_frames, voc_ctx + 1)

    mel = np.asarray(mel, np.float32)
    T = mel.shape[1]
    if T < 2:
        return

    def vocoder_for(window):
        return _make_chunk_vocoder(
            voc_dims, window, voc_target, voc_overlap, bool(mu_law),
            bool(apply_preemphasis), compute_dtype, bool(use_pallas),
            stream_dtype, float(_sp.max_abs_value),
        )

    first = min(first_chunk_frames or chunk_frames, chunk_frames)
    # the second chunk's context is the first chunk's tail: the first chunk
    # must cover the boundary frame + crossfade lead-in
    first = max(first, 1 + xfade_frames, 2)
    # chunk schedule: [first, chunk, chunk, ...] clipped to T
    starts, sizes = [], []
    pos = 0
    while pos < T:
        n = first if pos == 0 else chunk_frames
        n = min(n, T - pos)
        starts.append(pos)
        sizes.append(n)
        pos += n
    # merge a tiny tail chunk into its predecessor (window must stay ≥ 2)
    if len(sizes) > 1 and sizes[-1] < max(2, xfade_frames + 1):
        sizes[-2] += sizes[-1]
        starts.pop()
        sizes.pop()

    xfade = xfade_frames * hop
    tail: Optional[np.ndarray] = None
    key = jax.random.PRNGKey(seed ^ 0x5EED)

    def dispatch(i):
        s, n = starts[i], sizes[i]
        lo = max(s - voc_ctx, 0)
        cond = jnp.asarray(mel[:, lo : s + n])
        return vocoder_for(int(cond.shape[1]))(
            voc_variables, cond, jax.random.fold_in(key, i)
        )

    pending = dispatch(0)
    for i in range(len(starts)):
        wav_dev = pending
        if i + 1 < len(starts):
            # pipeline: launch the next chunk before transferring this one
            pending = dispatch(i + 1)
        wav = np.asarray(wav_dev)
        s, n = starts[i], sizes[i]
        ctx = min(voc_ctx, s)  # first chunk has no left context
        # a (ctx+n)-frame window decodes (ctx+n−1)·hop samples; drop the
        # context body minus the crossfade lead-in (same trim as
        # stream_clone — each chunk ends one frame short, recovered by the
        # next chunk's context)
        if i == 0:
            cut, end = 0, (n - 1) * hop
        else:
            cut = max((ctx - 1) * hop - xfade, 0)
            end = (ctx - 1 + n) * hop
        body = wav[cut:end]
        if tail is not None and xfade and len(body) >= xfade:
            ramp = np.sin(0.5 * np.pi * np.linspace(0, 1, xfade)) ** 2
            body = body.copy()
            body[:xfade] = tail * (1.0 - ramp) + body[:xfade] * ramp
        out, tail = (body[:-xfade], body[-xfade:]) if xfade else (body, None)
        final = i == len(starts) - 1
        if final:
            if tail is not None:
                out = np.concatenate([out, tail])
                tail = None
            out = out.copy()
            fade_len = min(20 * hop, len(out))
            if fade_len:
                out[-fade_len:] *= np.linspace(1.0, 0.0, fade_len)
        yield StreamChunk(
            wav=out, index=i, final=final, t_emitted=time.perf_counter()
        )


@functools.lru_cache(maxsize=8)
def _make_chunk_decoder(d, r: int, chunk_iters: int, min_iters: int = 0,
                        pad_value: float = -4.0):
    """Jitted: run ``chunk_iters`` decoder iterations from a carried state.

    Returns (mel_chunk (B, n_mels, chunk_iters·r), carry, prev_frame, done,
    valid_iters). Iterations after the stop condition write padding silence
    and freeze the carry (masked select — static shapes under jit).
    Cached per (dims, r, chunk) — a fresh jit per stream would retrace
    every request (measured: ~1.5 s of the first-audio latency).
    ``min_iters`` suppresses the stop token before that iteration (serving
    knob; also how benches get full-length streams from random weights)."""
    from rtvc_tpu.models import tacotron as taco

    @jax.jit
    def decode_chunk(variables, carry, prev_frame, done0, start_i,
                     enc_seq, enc_proj, char_mask, key):
        params = variables["params"]

        def body(state, it):
            carry, prev, done = state
            k = jax.random.fold_in(key, it)
            new_carry, m, _, stop = taco.decoder_step(
                params, d, r, carry, prev, enc_seq, enc_proj, char_mask,
                k, False,
            )
            fired = jnp.logical_and(
                jnp.all(stop > 0.5),
                jnp.logical_and(it * r > 10, it >= min_iters),
            )
            keep = lambda new, old: jnp.where(done, old, new)  # noqa: E731
            carry = jax.tree_util.tree_map(keep, new_carry, carry)
            prev = keep(m[:, :, -1], prev)
            m = jnp.where(done, jnp.float32(pad_value), m)  # silence pad
            emitted = jnp.logical_not(done)
            done = jnp.logical_or(done, fired)
            return (carry, prev, done), (m, emitted)

        (carry, prev, done), (mels, emitted) = jax.lax.scan(
            body, (carry, prev_frame, done0),
            start_i + jnp.arange(chunk_iters),
        )
        # (chunk_iters, B, n_mels, r) → (B, n_mels, chunk_iters·r)
        mel_chunk = jnp.moveaxis(mels, 0, 2).reshape(
            mels.shape[1], d.n_mels, chunk_iters * r
        )
        return mel_chunk, carry, prev, done, jnp.sum(emitted)

    return decode_chunk


def stream_clone(
    synth,
    voc_variables,
    voc_dims,
    text: str,
    embed: np.ndarray,
    seed: int = 0,
    chunk_frames: int = 48,
    post_ctx: int = 32,
    voc_ctx: int = 12,
    xfade_frames: int = 2,
    voc_target: int = 400,
    voc_overlap: int = 160,
    use_pallas: Optional[bool] = None,
    stream_dtype=jnp.bfloat16,
    min_frames: int = 0,
    first_chunk_frames: Optional[int] = None,
    mu_law: Optional[bool] = None,
    apply_preemphasis: Optional[bool] = None,
    compute_dtype=jnp.float32,
    voc_config=None,
) -> Iterator[StreamChunk]:
    """Clone ``text`` in ``embed``'s voice, yielding playable waveform
    chunks of ~``chunk_frames`` mel frames (~0.6 s at the production hop).

    ``synth`` is a loaded ``rtvc_tpu.inference.synthesizer.Synthesizer``
    of ANY model type. Tacotron streams the decoder itself (chunked scan
    with carried state); the NAR synthesizers (ForwardTacotron/FastPitch)
    emit their whole mel in one fast parallel pass, so their stream is the
    chunked vocoder (:func:`stream_vocode`) — best TTFA of all three.
    ``voc_variables`` / ``voc_dims`` come from the loaded vocoder bundle
    (``rtvc_tpu.inference.vocoder._model``).

    ``first_chunk_frames``: a smaller opening chunk ramps the stream —
    the first chunk's decode+vocode device time shrinks proportionally
    (e.g. 16 → 0.2 s of audio) while later chunks run at the steady-state
    size (one extra compiled decoder graph). Through a remote relay the
    gain sits inside dispatch-latency noise; it pays on attached hardware
    (docs/SERVING.md honesty note).

    ``mu_law``/``apply_preemphasis`` default from ``voc_config`` (the
    vocoder bundle's WaveRNNParams — pass it so non-mu-law / non-preemph
    checkpoints decode identically to ``vocoder.infer_waveform``).
    """
    from rtvc_tpu.config import preprocessing, sp as _sp
    from rtvc_tpu.inference.synthesizer import _CHAR_BUCKET, pad1d
    from rtvc_tpu.models import factories
    from rtvc_tpu.models import tacotron as taco
    from rtvc_tpu.text import text_to_sequence

    if synth._model_type != factories.MODEL_TYPE_TACOTRON:
        # NAR: one parallel mel pass, then the chunked vocoder
        mel = synth.synthesize_spectrograms(
            [text], [np.asarray(embed, np.float32)], seed=seed
        )[0]
        yield from stream_vocode(
            voc_variables, voc_dims, mel, seed=seed,
            chunk_frames=chunk_frames, voc_ctx=voc_ctx,
            xfade_frames=xfade_frames, voc_target=voc_target,
            voc_overlap=voc_overlap, use_pallas=use_pallas,
            stream_dtype=stream_dtype,
            first_chunk_frames=first_chunk_frames, mu_law=mu_law,
            apply_preemphasis=apply_preemphasis,
            compute_dtype=compute_dtype, voc_config=voc_config,
        )
        return

    d = synth._model.dims
    variables = synth._model.variables
    r = synth._r
    cfg = synth._model.config
    chunk_frames = -(-chunk_frames // r) * r
    chunk_iters = chunk_frames // r
    max_iters = cfg.max_decoder_steps // r
    hop = voc_dims.hop_length
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    # decode flags follow the vocoder checkpoint, like infer_waveform does;
    # mu-law only ever applies to the RAW categorical mode (the same guard
    # wavernn_generate applies — MOL/BITS outputs are already continuous)
    from rtvc_tpu.models.wavernn import MODE_RAW

    if mu_law is None:
        mu_law = getattr(voc_config, "mu_law", True)
    mu_law = bool(mu_law) and voc_dims.mode == MODE_RAW
    if apply_preemphasis is None:
        apply_preemphasis = _sp.preemphasize
    pad_value = -float(_sp.max_abs_value)
    post_ctx = max(post_ctx, 0)
    xfade_frames = max(xfade_frames, 0)
    # voc_ctx must be >= 1 + xfade_frames: a W-frame window decodes
    # (W-1)·hop samples, so each chunk's final frame is re-decoded by the
    # next chunk's context (1 frame), and the equal-power crossfade needs
    # its lead-in inside the context ((voc_ctx-1)·hop >= xfade). Below
    # that, the cut clamp silently drops samples at every join and the
    # stream runs short of the batch path's (Σvalid − 1)·hop invariant.
    voc_ctx = max(voc_ctx, 1 + xfade_frames)

    seq = text_to_sequence(text.strip(), preprocessing.cleaner_names)
    bucket_len = -(-len(seq) // _CHAR_BUCKET) * _CHAR_BUCKET
    chars = jnp.asarray(pad1d(seq, bucket_len)[None].astype(np.int32))
    embeds = jnp.asarray(np.asarray(embed, np.float32)[None])
    # Same key derivation as tacotron_generate (split 3, fold_in(k_dec, i))
    # → the streamed RAW decoder frames are bit-identical to the batch
    # path's; only the chunked postnet differs (tests/test_streaming.py).
    k_enc, k_dec, _ = jax.random.split(jax.random.PRNGKey(seed), 3)

    enc_seq, enc_proj = _cached_encode(d)(variables, chars, embeds, k_enc)
    char_mask = (chars != 0).astype(jnp.float32)

    steady_decoder = _make_chunk_decoder(d, r, chunk_iters,
                                         min_iters=min_frames // r,
                                         pad_value=pad_value)
    if first_chunk_frames:
        first_iters = max(-(-first_chunk_frames // r), 1)
        first_decoder = _make_chunk_decoder(d, r, first_iters,
                                            min_iters=min_frames // r,
                                            pad_value=pad_value)
    else:
        first_iters, first_decoder = chunk_iters, steady_decoder
    carry = taco.init_decoder_carry(d, 1, chars.shape[1])
    prev = jnp.zeros((1, d.n_mels))
    done = jnp.asarray(False)

    def _post_vocode(n_frames):
        return _make_post_vocode(
            d, voc_dims, post_ctx, voc_ctx, n_frames, voc_target,
            voc_overlap, bool(mu_law), bool(apply_preemphasis),
            compute_dtype, bool(use_pallas), stream_dtype,
            float(_sp.max_abs_value),
        )

    # Context buffers live ON DEVICE (initialized to the silence pad) —
    # chunk postnet+vocode run as one dispatch with no host round-trip.
    raw_hist = jnp.full((d.n_mels, post_ctx), pad_value, jnp.float32)
    post_hist = jnp.full((d.n_mels, voc_ctx), pad_value, jnp.float32)
    tail: Optional[np.ndarray] = None                 # xfade reservoir
    xfade = xfade_frames * hop
    start_i, index = 0, 0

    pending = first_decoder(
        variables, carry, prev, done, jnp.asarray(0),
        enc_seq, enc_proj, char_mask, k_dec,
    )
    while start_i < max_iters:
        n_iters = first_iters if index == 0 else chunk_iters
        n_frames = n_iters * r
        mel_chunk, carry, prev, done, valid = pending
        valid_frames = int(valid) * r  # scalar sync (waits for the decode)
        is_final = bool(done) or start_i + n_iters >= max_iters
        if valid_frames == 0:
            break

        wav_dev, raw_hist, post_hist = _post_vocode(n_frames)(
            variables, voc_variables, raw_hist, mel_chunk, post_hist,
            jax.random.fold_in(jax.random.PRNGKey(seed ^ 0x5EED), index),
            jnp.asarray(valid_frames, jnp.int32),
        )
        # Pipeline: dispatch the NEXT chunk's decode before transferring
        # this chunk's audio — the transfer overlaps the decode on device.
        if not is_final:
            pending = steady_decoder(
                variables, carry, prev, done, jnp.asarray(start_i + n_iters),
                enc_seq, enc_proj, char_mask, k_dec,
            )
        # the generate pipeline's raw output covers (W−1)·hop samples for a
        # W-frame window (wavernn_generate's trim, done here host-side)
        W = voc_ctx + n_frames
        wav = np.asarray(wav_dev)[: (W - 1) * hop]

        # Alignment: a window of F conditioning frames decodes (F−1)·hop
        # samples, so each chunk's wav ends one frame short; the NEXT
        # chunk's context re-decodes that boundary frame (cut at
        # (voc_ctx − 1)·hop, not voc_ctx·hop) — total stream length then
        # matches the batch clone's (Σvalid − 1)·hop. The FIRST chunk's
        # context is silence padding: cut all of it.
        if index == 0:
            cut = voc_ctx * hop
            end = (voc_ctx + valid_frames - 1) * hop
        else:
            cut = max((voc_ctx - 1) * hop - xfade, 0)
            end = (voc_ctx - 1 + valid_frames) * hop
        body = wav[cut:end]
        if tail is not None and xfade and len(body) >= xfade:
            ramp = np.sin(0.5 * np.pi * np.linspace(0, 1, xfade)) ** 2
            body = body.copy()
            body[:xfade] = tail * (1.0 - ramp) + body[:xfade] * ramp
        out, tail = (body[:-xfade], body[-xfade:]) if xfade else (body, None)
        if is_final:
            if tail is not None:
                out = np.concatenate([out, tail])
                tail = None
            out = out.copy()
            fade_len = min(20 * hop, len(out))
            if fade_len:
                out[-fade_len:] *= np.linspace(1.0, 0.0, fade_len)
        yield StreamChunk(
            wav=out, index=index, final=is_final, t_emitted=time.perf_counter()
        )
        index += 1
        start_i += n_iters
        if is_final:
            break
