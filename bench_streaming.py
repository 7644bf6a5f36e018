"""Time-to-first-audio benchmark for the streaming clone path
(rtvc_tpu/inference/streaming.py) — the serving metric the "real-time voice
cloning" name implies: how long after a request does the first playable
audio leave the device?

Runs the production-dims Tacotron + runtimeracer WaveRNN (random weights —
latency is weight-independent), a ~5 s utterance, chunks of ~0.6 s. After a
warmup pass (all graphs compiled; the persistent cache makes later process
starts cheap), reports:

  * ``ttfa_ms`` — request → first chunk ready (median of 3);
  * ``chunk_rtf`` — steady-state chunk cadence vs chunk audio duration
    (>1 means the stream outruns playback, i.e. no underruns);
  * ``total_ms`` vs the audio seconds produced.

One JSON line per metric; recorded in SERVING.md.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from rtvc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from rtvc_tpu.config.synthesizer import TacotronParams
    from rtvc_tpu.inference import synthesizer as syn_inf
    from rtvc_tpu.inference.streaming import stream_clone
    from rtvc_tpu.models import factories

    syn_bundle = factories.init_syn_model(factories.MODEL_TYPE_TACOTRON,
                                          seed=0)
    synth = syn_inf.Synthesizer(model_fpath="unused", verbose=False)
    synth.load_bundle(syn_bundle, r=2)
    voc = factories.init_voc_model(factories.MODEL_TYPE_RUNTIMERACER, seed=0)

    rng = np.random.default_rng(0)
    embed = rng.uniform(0, 1, 768).astype(np.float32)
    embed /= np.linalg.norm(embed)
    text = ("this is a streaming latency benchmark sentence that should "
            "synthesize roughly five seconds of audio output")
    sr = voc.dims.sample_rate

    def run(seed, first=None):
        t0 = time.perf_counter()
        ttfa = None
        stamps, samples = [], 0
        for chunk in stream_clone(
            synth, voc.variables, voc.dims, text, embed, seed=seed,
            chunk_frames=48, post_ctx=32, voc_ctx=12,
            voc_target=400, voc_overlap=160, first_chunk_frames=first,
            voc_config=voc.config,
            # random weights: the untrained stop head fires immediately —
            # force a full-length ~5 s stream (the latency being measured
            # is weight-independent)
            min_frames=400,
        ):
            if ttfa is None:
                ttfa = chunk.t_emitted - t0
            stamps.append(chunk.t_emitted)
            samples += len(chunk.wav)
        return ttfa, stamps, samples, time.perf_counter() - t0

    run(0)  # warmup: compiles every chunk graph
    ttfas, rtfs, totals = [], [], []
    for seed in range(1, 4):
        ttfa, stamps, samples, total = run(seed)
        ttfas.append(ttfa)
        if len(stamps) > 2:
            cadence = float(np.median(np.diff(stamps[1:])))
            chunk_audio = 48 * voc.dims.hop_length / sr
            rtfs.append(chunk_audio / max(cadence, 1e-9))
        totals.append((total, samples))

    ttfa_ms = 1000 * float(np.median(ttfas))
    print(json.dumps({"metric": "stream_ttfa", "value": round(ttfa_ms, 1),
                      "unit": "ms", "chunk_frames": 48}), flush=True)

    # ramped opening chunk: 16 frames (~0.2 s audio) cut TTFA further
    run(0, first=16)  # warmup the extra decoder graph
    r_ttfas = [run(seed, first=16)[0] for seed in range(1, 4)]
    print(json.dumps({
        "metric": "stream_ttfa_ramped", "value":
            round(1000 * float(np.median(r_ttfas)), 1),
        "unit": "ms", "first_chunk_frames": 16,
    }), flush=True)
    if rtfs:
        print(json.dumps({"metric": "stream_chunk_rtf",
                          "value": round(float(np.median(rtfs)), 2),
                          "unit": "x realtime (>1 = no underrun)"}),
              flush=True)
    total, samples = totals[-1]
    print(json.dumps({"metric": "stream_total", "value": round(1000 * total, 1),
                      "unit": "ms", "audio_s": round(samples / sr, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)
