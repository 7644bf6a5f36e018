"""Time-to-first-audio benchmark for the streaming clone path
(rtvc_tpu/inference/streaming.py) — the serving metric the "real-time voice
cloning" name implies: how long after a request does the first playable
audio leave the device?

Runs production-dims models (random weights — latency is
weight-independent), a ~5 s utterance, chunks of ~0.6 s. After a warmup
pass (all graphs compiled; the persistent cache makes later process starts
cheap), reports per synthesizer type:

  * ``ttfa_ms`` — request → first chunk ready, wall clock through the
    relay (median of 3);
  * ``ttfa_device_ms`` — the same first-chunk chain timed with pipelined
    async dispatches and ONE final transfer (round-2's device-time
    methodology for the headline metric): N chained dispatches of
    encode → first-chunk decode → postnet+vocode, so per-iteration time is
    device compute, not relay round-trips;
  * ``chunk_rtf`` — steady-state chunk cadence vs chunk audio duration
    (>1 means the stream outruns playback, i.e. no underruns);
  * ``total_ms`` vs the audio seconds produced.

Round 4 adds rows for ForwardTacotron and FastPitch: their mel arrives in
one parallel pass (ref forward_tacotron.py:185-204) and only the vocoder
streams — the best TTFA of the three.

One JSON line per metric; recorded in SERVING.md.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _measure(synth, voc, text, embed, label, stream_kwargs, n_seeds=3):
    from rtvc_tpu.inference.streaming import stream_clone

    sr = voc.dims.sample_rate

    def run(seed, first=None):
        kw = dict(stream_kwargs)
        if first is not None:
            kw["first_chunk_frames"] = first
        t0 = time.perf_counter()
        ttfa = None
        stamps, samples = [], 0
        for chunk in stream_clone(
            synth, voc.variables, voc.dims, text, embed, seed=seed,
            voc_config=voc.config, **kw,
        ):
            if ttfa is None:
                ttfa = chunk.t_emitted - t0
            stamps.append(chunk.t_emitted)
            samples += len(chunk.wav)
        return ttfa, stamps, samples, time.perf_counter() - t0

    run(0)  # warmup: compiles every chunk graph
    ttfas, rtfs, totals = [], [], []
    for seed in range(1, 1 + n_seeds):
        ttfa, stamps, samples, total = run(seed)
        ttfas.append(ttfa)
        if len(stamps) > 2:
            cadence = float(np.median(np.diff(stamps[1:])))
            chunk_audio = (
                stream_kwargs["chunk_frames"] * voc.dims.hop_length / sr
            )
            rtfs.append(chunk_audio / max(cadence, 1e-9))
        totals.append((total, samples))

    out = {
        "metric": f"stream_ttfa_{label}",
        "value": round(1000 * float(np.median(ttfas)), 1),
        "unit": "ms", "chunk_frames": stream_kwargs["chunk_frames"],
    }
    if rtfs:
        out["chunk_rtf"] = round(float(np.median(rtfs)), 2)
    total, samples = totals[-1]
    out["total_ms"] = round(1000 * total, 1)
    out["audio_s"] = round(samples / sr, 2)
    print(json.dumps(out), flush=True)
    return run


def _device_ttfa_tacotron(synth, voc, text, embed, first_frames=16,
                          post_ctx=32, voc_ctx=12, voc_target=400,
                          voc_overlap=160, reps=10):
    """Pipelined device time of the first-chunk chain: encode →
    first-chunk decode → postnet+vocode, N async dispatches, one
    transfer. This is what TTFA would be on directly-attached hardware
    (SERVING.md's former '~100 ms device-side' estimate, now measured)."""
    import jax
    import jax.numpy as jnp

    from rtvc_tpu.config import preprocessing, sp as _sp
    from rtvc_tpu.inference import streaming as st
    from rtvc_tpu.inference.synthesizer import _CHAR_BUCKET, pad1d
    from rtvc_tpu.models import tacotron as taco
    from rtvc_tpu.models.wavernn import MODE_RAW
    from rtvc_tpu.text import text_to_sequence

    d = synth._model.dims
    variables = synth._model.variables
    r = synth._r
    use_pallas = jax.devices()[0].platform == "tpu"
    mu_law = bool(getattr(voc.config, "mu_law", True)) and \
        voc.dims.mode == MODE_RAW

    seq = text_to_sequence(text.strip(), preprocessing.cleaner_names)
    bucket = -(-len(seq) // _CHAR_BUCKET) * _CHAR_BUCKET
    chars = jnp.asarray(pad1d(seq, bucket)[None].astype(np.int32))
    embeds = jnp.asarray(np.asarray(embed, np.float32)[None])
    first_iters = max(first_frames // r, 1)
    n_frames = first_iters * r
    pad_value = -float(_sp.max_abs_value)

    enc_fn = st._cached_encode(d)
    dec_fn = st._make_chunk_decoder(d, r, first_iters, min_iters=first_iters,
                                    pad_value=pad_value)
    pv_fn = st._make_post_vocode(
        d, voc.dims, post_ctx, voc_ctx, n_frames, voc_target, voc_overlap,
        mu_law, bool(_sp.preemphasize), jnp.float32, bool(use_pallas),
        jnp.bfloat16, float(_sp.max_abs_value),
    )
    char_mask = (chars != 0).astype(jnp.float32)
    carry = taco.init_decoder_carry(d, 1, chars.shape[1])
    prev = jnp.zeros((1, d.n_mels))
    done = jnp.asarray(False)
    raw_hist = jnp.full((d.n_mels, post_ctx), pad_value, jnp.float32)
    post_hist = jnp.full((d.n_mels, voc_ctx), pad_value, jnp.float32)

    def chain(k):
        key = jax.random.PRNGKey(k)
        k_enc, k_dec, _ = jax.random.split(key, 3)
        enc_seq, enc_proj = enc_fn(variables, chars, embeds, k_enc)
        mel_chunk, *_ = dec_fn(variables, carry, prev, done, jnp.asarray(0),
                               enc_seq, enc_proj, char_mask, k_dec)
        wav, _, _ = pv_fn(variables, voc.variables, raw_hist, mel_chunk,
                          post_hist, jax.random.fold_in(key, 1),
                          jnp.asarray(n_frames, jnp.int32))
        return wav

    np.asarray(chain(0))  # warm + sync
    t0 = time.perf_counter()
    outs = [chain(1 + i) for i in range(reps)]
    np.asarray(outs[-1])  # one transfer syncs the whole pipeline
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": "stream_ttfa_device_tacotron",
        "value": round(1000 * dt, 1), "unit": "ms",
        "first_chunk_frames": n_frames, "reps": reps,
    }), flush=True)


def main():
    from rtvc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from rtvc_tpu.inference import synthesizer as syn_inf
    from rtvc_tpu.models import factories

    rng = np.random.default_rng(0)
    embed = rng.uniform(0, 1, 768).astype(np.float32)
    embed /= np.linalg.norm(embed)
    text = ("this is a streaming latency benchmark sentence that should "
            "synthesize roughly five seconds of audio output")

    voc = factories.init_voc_model(factories.MODEL_TYPE_RUNTIMERACER, seed=0)

    # ---- Tacotron (chunked AR decoder) ----------------------------------
    syn_bundle = factories.init_syn_model(factories.MODEL_TYPE_TACOTRON,
                                          seed=0)
    synth = syn_inf.Synthesizer(model_fpath="unused", verbose=False)
    synth.load_bundle(syn_bundle, r=2)
    run = _measure(
        synth, voc, text, embed, "tacotron",
        dict(chunk_frames=48, post_ctx=32, voc_ctx=12, voc_target=400,
             voc_overlap=160,
             # random weights: the untrained stop head fires immediately —
             # force a full-length ~5 s stream (the latency being measured
             # is weight-independent)
             min_frames=400),
    )
    # ramped opening chunk: 16 frames (~0.2 s audio) cut TTFA further
    run(0, first=16)  # warmup the extra decoder graph
    r_ttfas = [run(seed, first=16)[0] for seed in range(1, 4)]
    print(json.dumps({
        "metric": "stream_ttfa_tacotron_ramped",
        "value": round(1000 * float(np.median(r_ttfas)), 1),
        "unit": "ms", "first_chunk_frames": 16,
    }), flush=True)
    _device_ttfa_tacotron(synth, voc, text, embed)

    # ---- NAR synthesizers (one-pass mel + chunked vocoder) --------------
    for label, mtype in (
        ("forward_tacotron", factories.MODEL_TYPE_FORWARD_TACOTRON),
        ("fastpitch", factories.MODEL_TYPE_FASTPITCH),
    ):
        nb = factories.init_syn_model(mtype, seed=0)
        ns = syn_inf.Synthesizer(model_fpath="unused", verbose=False)
        ns.load_bundle(nb)
        _measure(
            ns, voc, text, embed, label,
            dict(chunk_frames=48, voc_ctx=12, voc_target=400,
                 voc_overlap=160, first_chunk_frames=16),
        )


if __name__ == "__main__":
    main()
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)
