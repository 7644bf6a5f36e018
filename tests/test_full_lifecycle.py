"""The full framework lifecycle in one test, end to end on a synthetic
corpus: raw wavs → encoder preprocessing → GE2E training → synthesizer
preprocessing (audio/embeds/alignments) → Tacotron training → GTA synthesis
→ vocoder training → voice clone through the public inference APIs →
native-engine export and decode.

This is the integration the reference can only demonstrate operationally
(SURVEY.md §4); here it runs as a test.
"""
import json

import numpy as np
import pytest

import jax

from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.config.vocoder import WaveRNNParams

pytestmark = pytest.mark.slow  # excluded from the quick gate (make test)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from rtvc_tpu.utils.io import save_wav_float

    root = tmp_path_factory.mktemp("lifecycle")
    sr = 16000
    rng = np.random.default_rng(0)
    for s in range(2):
        d = root / "datasets" / "Tiny" / "speakers" / f"spk{s}"
        d.mkdir(parents=True)
        for u in range(2):
            t = np.arange(int(2.5 * sr)) / sr
            f0 = 110 + 70 * s + 15 * u
            wav = (
                0.4 * np.sin(2 * np.pi * f0 * t)
                + 0.2 * np.sin(2 * np.pi * 2.5 * f0 * t)
                + 0.01 * rng.standard_normal(len(t))
            ).astype(np.float32)
            save_wav_float(wav, d / f"utt{u}.wav", sr)
            (d / f"utt{u}.txt").write_text(f"speaker {s} says sample {u}")
    return root


def test_full_lifecycle(corpus):
    datasets_root = corpus / "datasets"
    models_dir = corpus / "models"

    # ---- 1. encoder preprocessing + GE2E training ---------------------------
    from rtvc_tpu.data.encoder_preprocess import encoder_preprocess_dataset
    from rtvc_tpu.data.ge2e_sampler import (
        SpeakerVerificationDataset,
        speaker_batch_iterator,
    )
    from rtvc_tpu.models.speaker_encoder import SpeakerEncoder
    from rtvc_tpu.train.trainer import train_encoder

    enc_dir = corpus / "SV2TTS" / "encoder"
    encoder_preprocess_dataset(
        datasets_root, enc_dir, ["Tiny/speakers"], "Tiny",
        extensions=(".wav",), n_threads=2,
    )
    ds = SpeakerVerificationDataset(enc_dir)
    # Full-size 40-mel frontend with a small LSTM so inference APIs line up
    enc_model = SpeakerEncoder(
        model=EncoderModelParams(model_hidden_size=32, model_embedding_size=768),
        data=EncoderDataParams(),
    )
    it = speaker_batch_iterator(ds, 2, 2, n_frames=80, prefetch=0, seed=0)
    out = train_encoder(
        "enc", it, models_dir, speakers_per_batch=2, utterances_per_speaker=2,
        learning_rate=1e-3, total_steps=3, save_every=2, eer_every=0,
        model=enc_model,
    )
    assert out["step"] == 3

    # reload the trained encoder through the public checkpoint path (this
    # also exercises config recovery: hidden=32 ≠ the module default)
    from rtvc_tpu.inference import encoder as enc_api

    enc_api.load_model(models_dir / "enc" / "enc.ckpt")
    assert enc_api._model_cfg.model_hidden_size == 32

    # ---- 2. synthesizer preprocessing (audio / embeds / alignments) --------
    from rtvc_tpu.data.synthesizer_preprocess import (
        create_align_features,
        create_embeddings,
        synthesizer_preprocess_dataset,
    )
    from rtvc_tpu.inference.attention import TacotronAligner
    from rtvc_tpu.models import factories

    syn_dir = corpus / "SV2TTS" / "synthesizer"
    syn_dir.mkdir(parents=True)
    synthesizer_preprocess_dataset(
        datasets_root, syn_dir, "Tiny", ["speakers"], [".wav"], ".txt",
        n_processes=2,
    )
    n_utts = sum(
        len(v) for v in json.loads((syn_dir / "train.json").read_text()).values()
    )
    assert n_utts >= 3
    create_embeddings(syn_dir, encoder_model_fpath=None, n_processes=2)

    taco_cfg = TacotronParams(
        embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
        encoder_K=2, lstm_dims=16, postnet_K=2, num_highways=2,
        max_decoder_steps=300,
        tts_schedule=((2, 4, 2, 1e-3, 5e-4),),
    )

    # ---- 3. Tacotron training ----------------------------------------------
    from rtvc_tpu.data.synthesizer_dataset import SynthesizerDataset, batch_iterator
    from rtvc_tpu.train.trainer import train_synthesizer

    dataset = SynthesizerDataset(syn_dir, ["mel", "embed"])

    def epoch_batches(session_idx, r):
        return batch_iterator(dataset, batch_size=2, r=r, seed=session_idx)

    tout = train_synthesizer(
        "taco", factories.MODEL_TYPE_TACOTRON, syn_dir, models_dir,
        epoch_batches, save_every=2, eval_interval=0, max_steps=4,
        override_hp=taco_cfg,
    )
    assert tout["step"] == 4

    taco_bundle = factories.init_syn_model(
        factories.MODEL_TYPE_TACOTRON, override_hp=taco_cfg,
        variables=tout["variables"],
    )

    # alignments from the trained tacotron
    create_align_features(
        syn_dir, None, batch_hook=TacotronAligner(bundle=taco_bundle)
    )
    assert len(list((syn_dir / "duration").glob("*.npy"))) == n_utts

    # ---- 4. GTA synthesis ----------------------------------------------------
    from rtvc_tpu.train.gta import run_synthesis

    voc_dir = corpus / "SV2TTS" / "vocoder"
    n_gta = run_synthesis(syn_dir, voc_dir, taco_bundle, r=2, batch_size=2)
    assert n_gta == n_utts

    # ---- 5. vocoder training on GTA mels ------------------------------------
    from rtvc_tpu.data.vocoder_dataset import VocoderDataset
    from rtvc_tpu.data.vocoder_dataset import batch_iterator as voc_batches
    from rtvc_tpu.train.trainer import train_vocoder

    voc_cfg = WaveRNNParams(
        rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=16,
        res_blocks=1, bits=6, seq_len=200 * 2,
        voc_tts_schedule=((2, 1e-3, 5e-4, 2),),
        gen_target=300, gen_overlap=100,
    )
    voc_dataset = VocoderDataset(
        voc_dir / "synthesized.json", voc_dir / "mels_gta",
        syn_dir / "wav", voc_cfg,
    )

    vout = train_vocoder(
        "voc", factories.MODEL_TYPE_RUNTIMERACER, models_dir,
        lambda s: voc_batches(voc_dataset, 2, voc_cfg, seed=s),
        save_every=2, max_steps=3, override_hp=voc_cfg,
    )
    assert vout["step"] == 3

    # ---- 6. clone through the public APIs -----------------------------------
    from rtvc_tpu.inference import synthesizer as syn_api
    from rtvc_tpu.inference import vocoder as voc_api

    synth = syn_api.Synthesizer(models_dir / "taco" / "taco.ckpt", verbose=False)
    synth.load()
    assert synth._model.dims.encoder_dims == 8  # config recovered

    voc_api.load_model(models_dir / "voc" / "voc.ckpt", verbose=False)

    ref_wav = enc_api.preprocess_wav(
        datasets_root / "Tiny" / "speakers" / "spk0" / "utt0.wav"
    )
    embed = enc_api.embed_utterance(ref_wav)
    [mel] = synth.synthesize_spectrograms(["hello lifecycle"], [embed], seed=3)
    wav = voc_api.infer_waveform(mel, target=300, overlap=100)
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()

    # ---- 7. native engine export + decode -----------------------------------
    from rtvc_tpu.native.convert import export_wavernn
    from rtvc_tpu.native.libwavernn import Vocoder as NativeVocoder

    voc_bundle = factories.init_voc_model(
        factories.MODEL_TYPE_RUNTIMERACER, override_hp=voc_cfg,
        variables=vout["variables"],
    )
    native_bin = models_dir / "voc.bin"
    export_wavernn(vout["variables"], voc_bundle.dims, native_bin)
    native = NativeVocoder(native_bin, "runtimeracer-wavernn", verbose=False)
    native.cfg = voc_cfg
    native.load(n_threads=1)
    native.setRandomSeed(3)
    wav_native = native.vocode_mel(mel)
    assert len(wav_native) == (mel.shape[1] - 1) * 200
    assert np.isfinite(wav_native).all()
