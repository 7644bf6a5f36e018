"""End-to-end pipeline test: embed → Tacotron mel → WaveRNN waveform,
through the public inference APIs (the demo_cli config-test path,
ref: demo_cli.py:86-126)."""
import numpy as np
import pytest

import jax

from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.config.vocoder import WaveRNNParams
from rtvc_tpu.inference import encoder as enc
from rtvc_tpu.inference import synthesizer as syn_inf
from rtvc_tpu.inference import vocoder as voc_inf
from rtvc_tpu.models import factories

pytestmark = pytest.mark.slow  # compile-heavy; full gate only


@pytest.fixture(scope="module")
def tiny_models():
    """Small-but-structurally-complete models for the pipeline test."""
    enc.init_random_model(seed=0)

    syn_cfg = TacotronParams(
        embed_dims=32, encoder_dims=16, decoder_dims=32, postnet_dims=16,
        encoder_K=4, lstm_dims=32, postnet_K=4, num_highways=2,
        max_decoder_steps=200,
    )
    syn_bundle = factories.init_syn_model(
        factories.MODEL_TYPE_TACOTRON, seed=0, override_hp=syn_cfg
    )
    synth = syn_inf.Synthesizer(model_fpath="unused", verbose=False)
    synth.load_bundle(syn_bundle, r=2)

    voc_cfg = WaveRNNParams(
        rnn_dims=32, fc_dims=32, compute_dims=16, res_out_dims=32,
        res_blocks=2, gen_target=1000, gen_overlap=200,
    )
    voc_bundle = factories.init_voc_model(
        factories.MODEL_TYPE_RUNTIMERACER, seed=0, override_hp=voc_cfg
    )
    voc_inf.load_bundle(voc_bundle)
    return synth


class TestFullPipeline:
    def test_embed_synthesize_vocode(self, tiny_models):
        synth = tiny_models
        # 1. encoder on 1 s of zeros (ref: demo_cli.py:95)
        embed = enc.embed_utterance(np.zeros(16000, dtype=np.float32))
        assert embed.shape == (768,)

        # 2. synthesizer on a 2-text batch (ref: demo_cli.py:100-109)
        texts = ["testing one two three", "the quick brown fox"]
        embeds = [embed, embed]
        mels = synth.synthesize_spectrograms(texts, embeds)
        assert len(mels) == 2
        for m in mels:
            assert m.shape[0] == 80
            assert m.shape[1] >= 1

        # 3. vocoder on concatenated mels with small target/overlap
        #    (ref: demo_cli.py:115-124)
        mel = np.concatenate(mels, axis=1)
        wav = voc_inf.infer_waveform(mel, target=400, overlap=100)
        assert wav.ndim == 1
        assert len(wav) == (mel.shape[1] - 1) * 200
        assert np.isfinite(wav).all()

    def test_vocoder_seed_determinism(self, tiny_models):
        mel = np.random.default_rng(0).uniform(-4, 4, (80, 20)).astype(np.float32)
        voc_inf.set_seed(1234)
        w1 = voc_inf.infer_waveform(mel, batched=False)
        voc_inf.set_seed(1234)
        w2 = voc_inf.infer_waveform(mel, batched=False)
        np.testing.assert_array_equal(w1, w2)

    def test_synthesizer_batch_consistency(self, tiny_models):
        """Mel for a text should not depend on batch padding neighbors."""
        synth = tiny_models
        rng = np.random.default_rng(3)
        e = rng.standard_normal(768).astype(np.float32)
        e /= np.linalg.norm(e)
        short = "hi there"
        long = "a significantly longer sentence to force padding of the short one"
        m_alone = synth.synthesize_spectrograms([short], [e], seed=7)[0]
        m_batched = synth.synthesize_spectrograms([short, long], [e, e], seed=7)[0]
        # Same bucketed length → same compiled shapes; generation is
        # stochastic (prenet dropout) but seeded identically.
        assert m_alone.shape[0] == m_batched.shape[0] == 80

    def test_make_spectrogram_and_griffin_lim_roundtrip(self, tiny_models):
        sr = 16000
        t = np.arange(sr) / sr
        wav = (0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mel = syn_inf.make_spectrogram(wav)
        assert mel.shape[0] == 80
        from rtvc_tpu.config import preprocessing

        import rtvc_tpu.config.signal as sig
        out = syn_inf.griffin_lim(mel[:, :40])
        assert np.isfinite(out).all()


class TestBatchedVocoding:
    def test_infer_waveforms_matches_lengths(self, tiny_models):
        rng = np.random.default_rng(5)
        mels = [
            rng.uniform(-4, 4, (80, 18)).astype(np.float32),
            rng.uniform(-4, 4, (80, 30)).astype(np.float32),
            rng.uniform(-4, 4, (80, 24)).astype(np.float32),
        ]
        wavs = voc_inf.infer_waveforms(mels, target=400, overlap=100)
        assert len(wavs) == 3
        for m, w in zip(mels, wavs):
            assert len(w) == (m.shape[1] - 1) * 200
            assert np.isfinite(w).all()


class TestGenerationBackendOptions:
    def test_forced_pallas_falls_back_on_cpu(self, tiny_models):
        """Forcing the Pallas backend where it can't run (CPU) must fall back
        to the XLA path once and remember, not crash the public API."""
        rng = np.random.default_rng(6)
        mel = rng.uniform(-4, 4, (80, 20)).astype(np.float32)
        voc_inf.set_generation_options(use_pallas=True)
        try:
            wav = voc_inf.infer_waveform(mel, target=400, overlap=100)
            assert np.isfinite(wav).all() and len(wav) == (20 - 1) * 200
            assert voc_inf._pallas_broken
            # second call goes straight to XLA (no retry loop)
            wav2 = voc_inf.infer_waveform(mel, target=400, overlap=100)
            assert np.isfinite(wav2).all()
        finally:
            voc_inf.set_generation_options()

    def test_auto_backend_is_xla_on_cpu(self, tiny_models):
        use_pallas, _, _ = voc_inf._gen_backend()
        assert not use_pallas

    def test_window_default_is_checkpoint_on_cpu(self, tiny_models):
        """The TPU-tuned 400/160 module default must NOT override the
        checkpoint's CPU-tuned gen_target/gen_overlap off-TPU (ADVICE r2);
        a user-set window wins everywhere."""
        cfg = voc_inf._model.config
        try:
            t, o = voc_inf._default_window(cfg)
            assert (t, o) == (cfg.gen_target, cfg.gen_overlap)
            voc_inf.set_generation_options(target=320, overlap=128)
            assert voc_inf._default_window(cfg) == (320, 128)
            # per-knob: setting only the overlap must NOT drag the
            # TPU-tuned target default onto a CPU backend (review r3)
            voc_inf._target_user_set = False
            voc_inf._overlap_user_set = False
            voc_inf.set_generation_options(overlap=96)
            assert voc_inf._default_window(cfg) == (cfg.gen_target, 96)
        finally:
            voc_inf.set_generation_options()
            voc_inf._target_user_set = False
            voc_inf._overlap_user_set = False

    def test_stream_dtype_plumbs_through_options(self, tiny_models):
        import jax.numpy as jnp

        try:
            _, _, sd = voc_inf._gen_backend()
            assert sd == jnp.bfloat16  # default
            voc_inf.set_generation_options(stream_dtype=jnp.float32)
            _, _, sd = voc_inf._gen_backend()
            assert sd == jnp.float32  # reference-parity opt-out
        finally:
            voc_inf.set_generation_options(stream_dtype=None)

    def test_forced_pallas_decoder_falls_back_on_cpu(self, tiny_models):
        """Forcing the Pallas Tacotron decoder on CPU (no Mosaic) must fall
        back to the XLA while_loop inside synthesize_spectrograms."""
        from rtvc_tpu.inference import synthesizer as syn_mod

        synth = tiny_models
        syn_mod.set_decoder_backend(True)
        try:
            embed = np.random.default_rng(0).uniform(0, 1, 768).astype(np.float32)
            embed /= np.linalg.norm(embed)
            [mel] = synth.synthesize_spectrograms(["backend fallback"], [embed])
            assert mel.shape[0] == 80 and np.isfinite(mel).all()
            assert syn_mod._pallas_decoder_broken
        finally:
            syn_mod.set_decoder_backend()
            synth._decode_cache = None
