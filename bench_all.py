"""Full benchmark suite over the 5 BASELINE.json measurement configs.

(bench.py stays the driver's single-line headline metric; this script prints
one JSON line per config for BENCHMARKS.md.)

Configs (BASELINE.json):
  1. speaker-encoder embed_utterance on a 5 s prompt
  2. Tacotron synthesize_spectrograms + Griffin-Lim
  3. WaveRNN infer_waveform (batched fold/overlap-add) — XLA and Pallas
  4. full clone: embed → Tacotron mel → WaveRNN audio (p50 latency)
  5. batched multi-utterance cloning

All models use random weights (no pretrained checkpoints exist anywhere for
this fork); compute cost is weight-independent.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    from rtvc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from rtvc_tpu.config import preprocessing, sp
    from rtvc_tpu.inference import encoder, synthesizer, vocoder
    from rtvc_tpu.models import factories

    results = []

    def emit(metric, value, unit, extra=None):
        row = {"metric": metric, "value": round(value, 3), "unit": unit}
        if extra:
            row.update(extra)
        results.append(row)
        print(json.dumps(row), flush=True)

    rng = np.random.default_rng(0)

    # ---- 1. encoder embed -------------------------------------------------
    # BASELINE.json config 1 measures on the actual reference sample
    # samples/p240_00000.mp3 (decoded via libmpg123); a synthetic 5 s prompt
    # is the fallback when the corpus is absent.
    encoder.init_random_model(seed=0)
    try:
        from rtvc_tpu.utils.io import sample_path

        sample_fpath = sample_path("p240_00000.mp3")
    except FileNotFoundError:
        sample_fpath = Path("/nonexistent/p240_00000.mp3")
    try:
        from rtvc_tpu.utils.io import load_wav

        prompt, _ = load_wav(sample_fpath, target_sr=16000)
        prompt_src = sample_fpath.name
    except Exception:
        prompt = (0.3 * np.sin(2 * np.pi * 220 * np.arange(5 * 16000) / 16000)
                  + 0.02 * rng.standard_normal(5 * 16000)).astype(np.float32)
        prompt_src = "synthetic_sine"
    wav_pre = encoder.preprocess_wav(prompt)
    dt = timeit(lambda: encoder.embed_utterance(wav_pre))
    emit("embed_utterance_5s", dt * 1000, "ms", {"prompt": prompt_src})
    embed = encoder.embed_utterance(wav_pre)

    # ---- 2. Tacotron + Griffin-Lim ----------------------------------------
    from rtvc_tpu.config.synthesizer import TacotronParams

    synth = synthesizer.Synthesizer("bench", verbose=False)
    bundle = factories.init_syn_model(
        factories.MODEL_TYPE_TACOTRON, seed=0,
        # 400 decoder steps = 5 s of audio: a representative decode length
        override_hp=TacotronParams(max_decoder_steps=400),
    )
    # random weights stop immediately; force a full-length decode so the
    # number reflects real utterance lengths
    bundle.variables["params"]["stop_proj"]["bias"] = jnp.asarray([-100.0])
    synth.load_bundle(bundle, r=2)
    text = "this is a benchmark of the tacotron synthesizer on tpu hardware"

    def synth_once():
        return synth.synthesize_spectrograms([text], [embed], seed=1)[0]

    dt = timeit(synth_once)
    mel = synth_once()
    emit("tacotron_synthesize", dt * 1000, "ms",
         {"frames": int(mel.shape[1])})

    # Decoder roofline: device time via pipelined dispatch + FLOPs from
    # XLA's cost model on the while_loop decode graph (round-3 MFU column)
    from rtvc_tpu.models import tacotron as taco
    from rtvc_tpu.utils.roofline import summarize, xla_cost

    d_t = bundle.dims
    chars_j = jnp.asarray(
        np.pad(np.asarray(
            [ord(c) % 60 + 1 for c in text], np.int32), (0, 64 - len(text) % 64)
        )[None]
    )
    embed_j = jnp.asarray(np.asarray(embed, np.float32)[None])

    decode = jax.jit(lambda v, c, e, k: taco.tacotron_generate(
        v, d_t, c, e, 2, k, max_steps=400
    ))
    try:
        flops, _ = xla_cost(decode, bundle.variables, chars_j, embed_j,
                            jax.random.PRNGKey(0))
        np.asarray(decode(bundle.variables, chars_j, embed_j,
                          jax.random.PRNGKey(0))[0])  # warmup
        N = 8
        t0 = time.perf_counter()
        outs = [decode(bundle.variables, chars_j, embed_j,
                       jax.random.PRNGKey(i)) for i in range(1, N + 1)]
        np.asarray(outs[-1][0])
        dt = (time.perf_counter() - t0) / N
        emit("tacotron_decoder_device", dt * 1000, "ms",
             {"frames": 400, **summarize(flops, dt)})
    except Exception as e:
        emit("tacotron_decoder_device", -1, "ms", {"error": str(e)[:80]})

    gl_pp = preprocessing.replace(griffin_lim_iters=30)
    from rtvc_tpu.ops.audio import inv_mel_spectrogram

    def gl_once():
        return np.asarray(
            inv_mel_spectrogram(jnp.asarray(mel), sp, gl_pp, jax.random.PRNGKey(0))
        )

    dt = timeit(gl_once)
    emit("griffin_lim_30it", dt * 1000, "ms")

    # ---- 2b. NAR synthesizers (single parallel pass — no AR loop) ----------
    chars_nar = jnp.asarray(
        rng.integers(1, 60, (1, 80)).astype(np.int32)
    )
    embed_nar = jnp.asarray(rng.standard_normal((1, 768)).astype(np.float32))
    for mtype, label in (
        (factories.MODEL_TYPE_FORWARD_TACOTRON, "forward_tacotron_generate"),
        (factories.MODEL_TYPE_FASTPITCH, "fastpitch_generate"),
    ):
        try:
            nb = factories.init_syn_model(mtype, seed=0)
            if mtype == factories.MODEL_TYPE_FORWARD_TACOTRON:
                from rtvc_tpu.models.forward_tacotron import (
                    forward_generate as nar_gen,
                )
            else:
                from rtvc_tpu.models.fast_pitch import (
                    fastpitch_generate as nar_gen,
                )

            def nar_once():
                m, _ = nar_gen(nb.variables, nb.dims, chars_nar, embed_nar,
                               jax.random.PRNGKey(0))
                return np.asarray(m)

            m = nar_once()
            dt = timeit(nar_once)
            emit(label, dt * 1000, "ms", {"frames": int(m.shape[-1])})
        except Exception as e:  # keep the suite running
            emit(label, -1, "ms", {"error": str(e)[:80]})

    # ---- 3. WaveRNN infer_waveform ----------------------------------------
    voc_bundle = factories.init_voc_model(factories.MODEL_TYPE_RUNTIMERACER, seed=0)
    vocoder.load_bundle(voc_bundle)
    mel5s = rng.uniform(-4, 4, (80, 400)).astype(np.float32)
    wav_len = (400 - 1) * 200

    from rtvc_tpu.models.wavernn import wavernn_generate

    for label, kwargs in (
        ("wavernn_xla_f32", {}),
        ("wavernn_pallas_f32", {"use_pallas": True}),
    ):
        try:
            def gen():
                return wavernn_generate(
                    voc_bundle.variables, voc_bundle.dims,
                    mel5s / sp.max_abs_value, jax.random.PRNGKey(0),
                    batched=True, target=400, overlap=160, mu_law=True,
                    apply_preemphasis=True, **kwargs,
                )

            dt = timeit(gen)
            emit(label, wav_len / dt / 1000, "kHz",
                 {"rtf_22k": round(wav_len / dt / 22050, 2)})
        except Exception as e:
            emit(label, -1, "kHz", {"error": str(e)[:80]})

    # ---- 4. full clone p50 -------------------------------------------------
    def clone():
        w = encoder.preprocess_wav(prompt)
        e = encoder.embed_utterance(w)
        m = synth.synthesize_spectrograms([text], [e], seed=1)[0]
        return vocoder.infer_waveform(m)  # module default window

    ts = [timeit(clone, n=1, warmup=0) for _ in range(3)]
    emit("full_clone_p50", float(np.median(ts)), "s")

    # ---- 5. batched multi-utterance cloning --------------------------------
    texts = [text, "a second sentence to synthesize in the same batch",
             "and a third shorter one", "plus number four"]
    embeds = [embed] * len(texts)

    def batched():
        mels = synth.synthesize_spectrograms(texts, embeds, seed=1)
        return vocoder.infer_waveforms(mels)  # module default window

    dt = timeit(batched, n=2)
    total_audio = sum((m.shape[1] - 1) * 200 for m in
                      synth.synthesize_spectrograms(texts, embeds, seed=1))
    emit("batched_clone_4utt", dt, "s",
         {"audio_s": round(total_audio / 16000, 2)})

    # ---- 5b. fused-batch vocoder throughput, device time -------------------
    # The serving mode customers deploy (round-4 verdict item 5): 4×5 s
    # utterances through ONE _generate_batch_pipeline dispatch (every
    # utterance's fold windows share the device batch axis — ref throughput
    # mode: synthesizer/inference.py:121-146 + fatchord_version.py:174-177).
    # Pipelined-dispatch methodology as bench.py's headline.
    from rtvc_tpu.models.wavernn import _FRAME_BUCKET, _generate_batch_pipeline

    n_utt, n_frames = 4, 400
    bucket = -(-n_frames // _FRAME_BUCKET) * _FRAME_BUCKET
    stack = np.full((n_utt, 80, bucket), -1.0, np.float32)
    stack[:, :, :n_frames] = rng.uniform(-1, 1, (n_utt, 80, n_frames))
    stack_j = jnp.asarray(stack)
    fused_audio = n_utt * (n_frames - 1) * 200  # samples out

    def _fused(i, use_pallas):
        return _generate_batch_pipeline(
            voc_bundle.variables, voc_bundle.dims, stack_j,
            jax.random.PRNGKey(300 + i), 400, 160, True, True,
            jnp.float32, use_pallas, jnp.bfloat16,
        )

    try:
        use_pallas = jax.devices()[0].platform == "tpu"
        try:
            np.asarray(_fused(0, use_pallas))  # warmup
        except Exception:
            use_pallas = False
            np.asarray(_fused(0, use_pallas))
        N = 8
        chain_times = []
        for rep in range(3):
            t0 = time.perf_counter()
            outs = [_fused(10 * rep + i, use_pallas) for i in range(1, N + 1)]
            np.asarray(outs[-1])
            chain_times.append((time.perf_counter() - t0) / N)
        dt = float(np.median(chain_times))
        emit("wavernn_gen_rate_fusedbatch", fused_audio / dt / 1000, "kHz",
             {"n_utt": n_utt, "audio_s": round(fused_audio / 16000, 2),
              "rtf_22k": round(fused_audio / dt / 22050, 2),
              "pallas": use_pallas})
    except Exception as e:
        emit("wavernn_gen_rate_fusedbatch", -1, "kHz", {"error": str(e)[:80]})

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
    # The axon PJRT client can hang in teardown after remote compiles; the
    # output is already flushed, so exit hard to keep CI/driver runs snappy.
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)
