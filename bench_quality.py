"""Tracked audio-quality benchmark (the round-2 verdict's missing artifact).

Overfits the tiny end-to-end pipeline on a REAL-SPEECH corpus (the in-repo
``samples/`` utterances — VCTK p240 + LibriSpeech 1320/3575, split into 2 s
segments per speaker; synthetic-tone fallback when mp3 decode is
unavailable), then emits scalar audio-quality numbers that are diffable
across rounds:

  * ``clone_embed_cosine`` — clone a REFERENCE-SAMPLE prompt
    (samples/p240_00000.mp3) end-to-end through the public APIs and report
    the speaker-embedding cosine between prompt and clone (the toolbox
    autotune metric, ref: toolbox/toolbox.py:413-473) — plus two anchor
    rows that put the absolute on a readable scale for THIS tiny-budget
    encoder: ``embed_cosine_same_speaker_anchor`` (two halves of the
    prompt utterance — the ceiling a perfect clone could reach) and
    ``embed_cosine_diff_speaker_floor`` (prompt vs another speaker);
  * ``gta_vocoded_mcd`` — mel-cepstral distortion between a training
    utterance's ground-truth audio and the vocoder's decode of its GTA mel
    (the classic vocoder-fidelity number — real speech puts it on the
    interpretable dB scale);
  * on TPU only, ``bf16_stream_sampled_divergence`` — SAMPLED (not greedy)
    decodes of the same mel under common randomness with f32 vs bf16
    conditioning streams, reported as mel-L2 divergence next to the
    different-seed divergence floor. Backs the bf16-stream serving default
    with a sampled-output metric rather than greedy agreement alone.

Self-gating (round 4): each metric row carries ``delta_vs_prev`` against
the committed BENCH_QUALITY.json from the previous round (same corpus tag
only) and a ``status`` of pass/warn/fail — >10 %% cosine drop or >10 %%
MCD rise fails the run (exit code 1) so a regression is machine-visible,
not dependent on a human remembering last round's numbers.

Deterministic seeds throughout; one JSON line per metric. Run standalone
(CPU ok; ~5-10 min): results are recorded in BENCHMARKS.md's quality table.
"""
from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import numpy as np

CORPUS_TAG = "real_speech_v2"  # bump when the corpus/budget changes
PREV_PATH = Path(__file__).parent / "BENCH_QUALITY.json"
FAILED_PATH = Path(__file__).parent / "BENCH_QUALITY.failed.json"

# Tiny-vocoder dims, shared between main()'s training config and
# _voc_cfg_of()'s decode-path rebuild so the two can never drift apart.
_VOC_TINY_DIMS = dict(
    rnn_dims=64, fc_dims=64, compute_dims=32, res_out_dims=32,
    res_blocks=2, bits=8, seq_len=200 * 4,
)

# RTVC_QUALITY_FAST=1: tiny training budgets + no artifact write — lets a
# CPU test drive every metric path end-to-end in minutes (the numbers are
# meaningless; only the plumbing is under test)
FAST = __import__("os").environ.get("RTVC_QUALITY_FAST") == "1"


def build_corpus(root: Path) -> str:
    """Real-speech corpus from the in-repo fixtures: one 'speaker' per
    sample file, utterances = 2 s segments. Returns the corpus tag
    actually used (synthetic fallback when no mp3 decode)."""
    from rtvc_tpu.utils.io import save_wav_float

    sr = 16000
    texts = ["the quick brown fox", "jumps over the lazy dog",
             "a voice made of real speech", "counting one two three four"]
    try:
        from rtvc_tpu.utils.io import load_wav, sample_path

        speakers = {}
        for s, name in enumerate(
            ("p240_00000.mp3", "1320_00000.mp3", "3575_00000.mp3")
        ):
            wav, _ = load_wav(sample_path(name), target_sr=sr)
            wav = wav / max(float(np.abs(wav).max()), 1e-9) * 0.8
            seg = 2 * sr
            utts = [wav[i : i + seg] for i in range(0, len(wav) - seg + 1, seg)]
            if len(utts) < 3:  # speakers need ≥3 utterances for GE2E crops
                utts.append(wav[-seg:])
            speakers[f"spk{s}"] = utts[:4]
        for spk, utts in speakers.items():
            d = root / "datasets" / "Tiny" / "speakers" / spk
            d.mkdir(parents=True)
            for u, w in enumerate(utts):
                save_wav_float(w.astype(np.float32), d / f"utt{u}.wav", sr)
                (d / f"utt{u}.txt").write_text(texts[u % len(texts)])
        return CORPUS_TAG
    except Exception:
        # no mp3 decode in this environment: harmonic-tone fallback
        rng = np.random.default_rng(0)
        for s in range(2):
            d = root / "datasets" / "Tiny" / "speakers" / f"spk{s}"
            d.mkdir(parents=True)
            for u in range(4):
                t = np.arange(int(2.0 * sr)) / sr
                f0 = 120 + 80 * s + 10 * u
                wav = (
                    0.4 * np.sin(2 * np.pi * f0 * t)
                    + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
                    + 0.1 * np.sin(2 * np.pi * 3 * f0 * t)
                    + 0.005 * rng.standard_normal(len(t))
                ).astype(np.float32)
                save_wav_float(wav, d / f"utt{u}.wav", sr)
                (d / f"utt{u}.txt").write_text(texts[u])
        return "synthetic_tones"


def _load_prev() -> dict:
    """metric → previous row, from the committed BENCH_QUALITY.json."""
    prev = {}
    try:
        for line in PREV_PATH.read_text().splitlines():
            line = line.strip()
            if line:
                row = json.loads(line)
                prev[row["metric"]] = row
    except Exception:
        pass
    return prev


# per-metric gate: (higher_is_better, fail_fraction, warn_fraction, scale_floor)
# scale_floor is the metric's noise scale: the worsening fraction is taken
# against max(|prev|, scale_floor), so a near-zero baseline (e.g. the tiny
# budget leaves clone_embed_cosine ≈ 0.03 — embedding noise at that budget
# is larger than 10 % of 0.03) can't turn run-to-run jitter into a fail.
_GATES = {
    "clone_embed_cosine": (True, 0.10, 0.03, 0.30),
    "gta_vocoded_mcd": (False, 0.10, 0.03, 5.0),
    "gt_vocoded_mcd": (False, 0.10, 0.03, 5.0),
    "gl_vocoded_mcd": (False, 0.10, 0.03, 5.0),
}


def _delta_status(metric: str, value: float, prev_row: dict | None,
                  corpus: str, platform: str) -> dict:
    """delta_vs_prev + pass/warn/fail vs the previous round's row (only
    when the corpus tag AND platform match — cross-corpus numbers aren't
    comparable, and platform changes the numerics defaults, e.g. the bf16
    compute policy is auto-on only for TPU)."""
    # Strict platform match: a legacy row with no "platform" tag was
    # measured on an unknown backend, so it must NOT gate this run
    # (defaulting it to the current platform would compare CPU numbers
    # against TPU baselines — exactly the cross-platform comparison this
    # guard exists to prevent).
    if (not prev_row or prev_row.get("corpus") != corpus
            or prev_row.get("platform") != platform):
        return {"status": "no_baseline"}
    prev = float(prev_row["value"])
    delta = value - prev
    out = {"delta_vs_prev": round(delta, 4),
           "delta_pct": round(100.0 * delta / max(abs(prev), 1e-9), 2)}
    gate = _GATES.get(metric)
    if gate is None:
        out["status"] = "tracked"
        return out
    higher_better, fail_f, warn_f, scale_floor = gate
    worsening = -delta if higher_better else delta
    frac = worsening / max(abs(prev), scale_floor)
    out["status"] = ("fail" if frac > fail_f
                     else "warn" if frac > warn_f else "pass")
    return out


def train_tiny_pipeline(root: Path):
    """Encoder → synthesizer (+GTA) → vocoder, overfit on the tiny corpus.
    Returns (models_dir, syn_dir, voc_dir, taco_bundle, voc_out)."""
    from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
    from rtvc_tpu.config.synthesizer import TacotronParams
    from rtvc_tpu.config.vocoder import WaveRNNParams
    from rtvc_tpu.data.encoder_preprocess import encoder_preprocess_dataset
    from rtvc_tpu.data.ge2e_sampler import (
        SpeakerVerificationDataset,
        speaker_batch_iterator,
    )
    from rtvc_tpu.data.synthesizer_dataset import SynthesizerDataset, batch_iterator
    from rtvc_tpu.data.synthesizer_preprocess import (
        create_embeddings,
        synthesizer_preprocess_dataset,
    )
    from rtvc_tpu.data.vocoder_dataset import VocoderDataset
    from rtvc_tpu.data.vocoder_dataset import batch_iterator as voc_batches
    from rtvc_tpu.models import factories
    from rtvc_tpu.models.speaker_encoder import SpeakerEncoder
    from rtvc_tpu.train.gta import run_synthesis
    from rtvc_tpu.train.trainer import train_encoder, train_synthesizer, train_vocoder

    datasets_root = root / "datasets"
    models_dir = root / "models"

    enc_dir = root / "SV2TTS" / "encoder"
    encoder_preprocess_dataset(
        datasets_root, enc_dir, ["Tiny/speakers"], "Tiny",
        extensions=(".wav",), n_threads=2,
    )
    ds = SpeakerVerificationDataset(enc_dir)
    enc_model = SpeakerEncoder(
        model=EncoderModelParams(model_hidden_size=64, model_embedding_size=768),
        data=EncoderDataParams(),
    )
    it = speaker_batch_iterator(ds, 2, 3, n_frames=80, prefetch=0, seed=0)
    train_encoder(
        "enc", it, models_dir, speakers_per_batch=2, utterances_per_speaker=3,
        learning_rate=1e-3, total_steps=10 if FAST else 100,
        save_every=100, eer_every=0,
        model=enc_model,
    )

    from rtvc_tpu.inference import encoder as enc_api

    enc_api.load_model(models_dir / "enc" / "enc.ckpt")

    syn_dir = root / "SV2TTS" / "synthesizer"
    syn_dir.mkdir(parents=True)
    synthesizer_preprocess_dataset(
        datasets_root, syn_dir, "Tiny", ["speakers"], [".wav"], ".txt",
        n_processes=2,
    )
    create_embeddings(syn_dir, encoder_model_fpath=None, n_processes=2)

    taco_cfg = TacotronParams(
        embed_dims=32, encoder_dims=16, decoder_dims=32, postnet_dims=16,
        encoder_K=4, lstm_dims=32, postnet_K=4, num_highways=2,
        max_decoder_steps=400,
        tts_schedule=((2, 5 if FAST else 40, 4, 1e-3, 3e-4),),
    )
    dataset = SynthesizerDataset(syn_dir, ["mel", "embed"])

    def epoch_batches(session_idx, r):
        return batch_iterator(dataset, batch_size=4, r=r, seed=session_idx)

    tout = train_synthesizer(
        "taco", factories.MODEL_TYPE_TACOTRON, syn_dir, models_dir,
        epoch_batches, save_every=100, eval_interval=0,
        max_steps=10 if FAST else 100,
        override_hp=taco_cfg,
    )
    taco_bundle = factories.init_syn_model(
        factories.MODEL_TYPE_TACOTRON, override_hp=taco_cfg,
        variables=tout["variables"],
    )

    voc_dir = root / "SV2TTS" / "vocoder"
    run_synthesis(syn_dir, voc_dir, taco_bundle, r=2, batch_size=4)

    voc_cfg = WaveRNNParams(
        **_VOC_TINY_DIMS,
        voc_tts_schedule=((15 if FAST else 800, 1e-3, 3e-4, 4),),
        gen_target=400, gen_overlap=150,
    )
    voc_dataset = VocoderDataset(
        voc_dir / "synthesized.json", voc_dir / "mels_gta",
        syn_dir / "wav", voc_cfg,
    )
    # 1500 steps: post-compile throughput is ~23 steps/s on the TPU, so
    # the deeper overfit costs ~1 min and moves the vocoded MCDs from
    # "noise" toward the interpretable range the GL anchor sits in
    vout = train_vocoder(
        "voc", factories.MODEL_TYPE_RUNTIMERACER, models_dir,
        lambda s: voc_batches(voc_dataset, 4, voc_cfg, seed=s),
        save_every=2000, max_steps=30 if FAST else 1500,
        override_hp=voc_cfg,
    )
    return models_dir, syn_dir, voc_dir, taco_bundle, vout


def divergence_only():
    """The TPU-only sampled f32-vs-bf16-stream check, standalone: decodes a
    fixed synthetic mel with the production runtimeracer graph (random
    weights — the numerics question is weight-independent) under common
    randomness, and compares the dtype divergence against the
    different-seed divergence floor."""
    import jax
    import jax.numpy as jnp

    from rtvc_tpu.config import preprocessing, sp
    from rtvc_tpu.models import factories
    from rtvc_tpu.models.wavernn import wavernn_generate
    from rtvc_tpu.utils.cache import enable_persistent_cache
    from rtvc_tpu.utils.genquality import mel_l2_distance

    enable_persistent_cache()
    bundle = factories.init_voc_model(factories.MODEL_TYPE_RUNTIMERACER,
                                      seed=0)
    mel = np.random.default_rng(0).uniform(
        -1, 1, (bundle.dims.feat_dims, 160)
    ).astype(np.float32)

    def decode(key, stream_dtype):
        return wavernn_generate(
            bundle.variables, bundle.dims, mel, jax.random.PRNGKey(key),
            batched=True, target=400, overlap=160, use_pallas=True,
            stream_dtype=stream_dtype,
        )

    w_f32 = decode(0, jnp.float32)
    w_bf16 = decode(0, jnp.bfloat16)
    w_seed = decode(1, jnp.float32)
    d_dtype = mel_l2_distance(w_f32, w_bf16, sp, preprocessing)
    d_seed = mel_l2_distance(w_f32, w_seed, sp, preprocessing)
    row = {
        "metric": "bf16_stream_sampled_divergence",
        "value": round(d_dtype, 4),
        "different_seed_floor": round(d_seed, 4),
        "ratio": round(d_dtype / max(d_seed, 1e-9), 3),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    import jax

    # RTVC_QUALITY_CPU=1: force the CPU platform (fallback when the TPU
    # relay is unavailable; rows carry platform so the delta gate never
    # compares across platforms). Env vars alone are ignored here —
    # sitecustomize pre-imports jax — so use jax.config.update.
    if __import__("os").environ.get("RTVC_QUALITY_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from rtvc_tpu.config import preprocessing, sp
    from rtvc_tpu.utils.cache import enable_persistent_cache
    from rtvc_tpu.utils.genquality import (
        mel_cepstral_distortion,
        mel_l2_distance,
    )

    enable_persistent_cache()
    results = []
    prev = _load_prev()
    corpus_used = {"tag": "?"}

    platform = jax.devices()[0].platform

    def emit(metric, value, **extra):
        value = round(float(value), 4)
        row = {"metric": metric, "value": value, **extra,
               "corpus": corpus_used["tag"], "platform": platform}
        row.update(_delta_status(metric, value, prev.get(metric),
                                 corpus_used["tag"], platform))
        results.append(row)
        print(json.dumps(row), flush=True)

    root = Path(tempfile.mkdtemp(prefix="rtvc_quality_"))
    try:
        corpus_used["tag"] = build_corpus(root)
        models_dir, syn_dir, voc_dir, taco_bundle, vout = train_tiny_pipeline(root)

        from rtvc_tpu.inference import encoder as enc_api
        from rtvc_tpu.inference import synthesizer as syn_api
        from rtvc_tpu.inference import vocoder as voc_api

        # ---- clone a reference-sample prompt, embed cosine ----------------
        synth = syn_api.Synthesizer(models_dir / "taco" / "taco.ckpt",
                                    verbose=False)
        synth.load()
        voc_api.load_model(models_dir / "voc" / "voc.ckpt", verbose=False)
        voc_api.set_seed(7)

        try:
            from rtvc_tpu.utils.io import sample_path

            prompt_path = sample_path("p240_00000.mp3")
        except FileNotFoundError:
            prompt_path = Path("/nonexistent")
        if prompt_path.exists():
            try:
                prompt_wav = enc_api.preprocess_wav(prompt_path)
            except Exception:
                prompt_wav = None
        else:
            prompt_wav = None
        if prompt_wav is None:  # no mp3 decode: use a held-out corpus wav
            from rtvc_tpu.utils.io import load_wav

            prompt_wav, _ = load_wav(
                root / "datasets" / "Tiny" / "speakers" / "spk0" / "utt0.wav",
                target_sr=sp.sample_rate,
            )
        prompt_embed = enc_api.embed_utterance(prompt_wav)
        [mel] = synth.synthesize_spectrograms(
            ["the quick brown fox"], [prompt_embed], seed=3
        )
        clone_wav = voc_api.infer_waveform(mel, target=400, overlap=150)
        clone_embed = enc_api.embed_utterance(
            enc_api.preprocess_wav(clone_wav.astype(np.float32),
                                   source_sr=sp.sample_rate)
        )
        emit("clone_embed_cosine", float(np.dot(prompt_embed, clone_embed)),
             prompt="p240_00000.mp3" if prompt_path.exists() else "synthetic")

        # Anchors that make the absolute cosine readable against THIS
        # tiny-budget encoder (the toolbox autotune metric is read against
        # exactly such a scale, ref toolbox/toolbox.py:413-473):
        #   ceiling = two halves of the prompt utterance (same speaker,
        #             different content — the best a perfect clone could do)
        #   floor   = a different speaker's utterance vs the prompt
        from rtvc_tpu.utils.io import load_wav as _load_wav

        half = len(prompt_wav) // 2
        if half >= sp.sample_rate:  # each half long enough to embed
            e1 = enc_api.embed_utterance(prompt_wav[:half])
            e2 = enc_api.embed_utterance(prompt_wav[half:])
            emit("embed_cosine_same_speaker_anchor", float(np.dot(e1, e2)))
        other_wav, _ = _load_wav(
            root / "datasets" / "Tiny" / "speakers" / "spk1" / "utt0.wav",
            target_sr=sp.sample_rate,
        )
        other_embed = enc_api.embed_utterance(other_wav)
        emit("embed_cosine_diff_speaker_floor",
             float(np.dot(prompt_embed, other_embed)))

        # ---- MCD: GT audio vs vocoded GTA reconstruction -------------------
        import json as _json

        # synthesized.json: {utt_id: "utt_id|n_samples|n_frames|text"};
        # GTA mels live at mels_gta/<utt_id>.npy as (T, 80)
        meta = _json.loads((voc_dir / "synthesized.json").read_text())
        utt_id = sorted(meta)[0]
        gta_mel = np.load(voc_dir / "mels_gta" / f"{utt_id}.npy")  # (T, 80)
        gt_wav = np.load(syn_dir / "wav" / f"audio-{utt_id}.npy")
        recon = voc_api.infer_waveform(gta_mel.T, normalize=True,
                                       target=400, overlap=150)
        mcd = mel_cepstral_distortion(gt_wav, recon, sp, preprocessing)
        emit("gta_vocoded_mcd", mcd, unit="dB", utt=utt_id)

        # vocoder-only error: decode the GROUND-TRUTH mel (no Tacotron in
        # the loop) and compare against its own source audio
        gt_mel = np.load(syn_dir / "mels" / f"mel-{utt_id}.npy")
        if gt_mel.shape[0] != 80:
            gt_mel = gt_mel.T
        recon_gt = voc_api.infer_waveform(gt_mel, normalize=True,
                                          target=400, overlap=150)
        emit("gt_vocoded_mcd",
             mel_cepstral_distortion(gt_wav, recon_gt, sp, preprocessing),
             unit="dB", utt=utt_id)

        # Griffin-Lim anchor: reconstruct the same GT mel with the DSP
        # inverse (no learned vocoder in the loop — ref keeps a GL wav in
        # every listening triplet, vocoder/gen_wavernn.py:26-31). This is
        # the interpretable absolute: a healthy mel↔audio ladder puts GL
        # MCD in single digits, so it both proves the metric's scale and
        # gives the vocoded numbers a floor to be compared against.
        import jax as _jax

        from rtvc_tpu.ops.audio import inv_mel_spectrogram

        gl_wav = np.asarray(inv_mel_spectrogram(
            gt_mel, sp, preprocessing, _jax.random.PRNGKey(0),
            length=len(gt_wav),
        ))
        emit("gl_vocoded_mcd",
             mel_cepstral_distortion(gt_wav, gl_wav, sp, preprocessing),
             unit="dB", utt=utt_id)

        # ---- TPU only: sampled f32-vs-bf16-stream divergence ---------------
        if jax.devices()[0].platform == "tpu":
            import jax.numpy as jnp

            from rtvc_tpu.models import factories
            from rtvc_tpu.models.wavernn import wavernn_generate

            # production decode path on the OVERFIT vocoder weights
            d = factories.init_voc_model(
                factories.MODEL_TYPE_RUNTIMERACER,
                override_hp=_voc_cfg_of(),
            ).dims

            def decode(key, stream_dtype):
                return wavernn_generate(
                    vout["variables"], d, gta_mel.T / sp.max_abs_value,
                    jax.random.PRNGKey(key), batched=True, target=400,
                    overlap=150, use_pallas=True, stream_dtype=stream_dtype,
                )

            w_f32 = decode(0, jnp.float32)
            w_bf16 = decode(0, jnp.bfloat16)
            w_seed = decode(1, jnp.float32)
            d_dtype = mel_l2_distance(w_f32, w_bf16, sp, preprocessing)
            d_seed = mel_l2_distance(w_f32, w_seed, sp, preprocessing)
            emit("bf16_stream_sampled_divergence", d_dtype,
                 different_seed_floor=round(d_seed, 4),
                 ratio=round(d_dtype / max(d_seed, 1e-9), 3))

        statuses = [r.get("status") for r in results]
        gate = {"metric": "quality_gate",
                "value": ("fail" if "fail" in statuses
                          else "warn" if "warn" in statuses else "pass"),
                "n_metrics": len(results)}
        results.append(gate)
        print(json.dumps(gate), flush=True)
        if not FAST:  # fast mode: plumbing only, never record or gate
            payload = "\n".join(json.dumps(r) for r in results) + "\n"
            if gate["value"] == "fail":
                # Do NOT replace the baseline with the regressed rows —
                # otherwise a simple re-run would gate against the
                # regression and pass. Park the evidence next to it.
                FAILED_PATH.write_text(payload)
                print(f"quality gate FAILED — rows written to {FAILED_PATH}; "
                      f"baseline {PREV_PATH.name} left untouched", flush=True)
                raise SystemExit(1)
            PREV_PATH.write_text(payload)
            FAILED_PATH.unlink(missing_ok=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _voc_cfg_of():
    """The tiny vocoder dims (shared with main's training config via
    _VOC_TINY_DIMS — a second hand-written literal here once drifted)."""
    from rtvc_tpu.config.vocoder import WaveRNNParams

    return WaveRNNParams(**_VOC_TINY_DIMS)


if __name__ == "__main__":
    import os
    import sys

    rc = 0
    try:
        if "--divergence_only" in sys.argv:
            divergence_only()
        else:
            main()
    except SystemExit as e:  # quality gate failed — keep the hard exit
        rc = int(e.code or 0)
    sys.stdout.flush()
    os._exit(rc)
