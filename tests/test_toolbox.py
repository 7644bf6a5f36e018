"""Toolbox capability tests (headless, tiny models)."""
import numpy as np
import pytest

from rtvc_tpu import toolbox as tb
from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.config.vocoder import WaveRNNParams
from rtvc_tpu.inference import encoder as enc
from rtvc_tpu.inference import synthesizer as syn_inf
from rtvc_tpu.inference import vocoder as voc_inf
from rtvc_tpu.models import factories
from rtvc_tpu.utils.io import save_wav_float


@pytest.fixture(scope="module")
def box(tmp_path_factory):
    out = tmp_path_factory.mktemp("tb")
    enc.init_random_model(seed=0)
    synth = syn_inf.Synthesizer("unused", verbose=False)
    synth.load_bundle(
        factories.init_syn_model(
            factories.MODEL_TYPE_TACOTRON,
            override_hp=TacotronParams(
                embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
                encoder_K=2, lstm_dims=16, postnet_K=2, num_highways=2,
                max_decoder_steps=100,
            ),
        ),
        r=2,
    )
    voc_inf.load_bundle(
        factories.init_voc_model(
            factories.MODEL_TYPE_RUNTIMERACER,
            override_hp=WaveRNNParams(
                rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=16,
                res_blocks=1, bits=6, gen_target=200, gen_overlap=100,
            ),
        )
    )
    b = tb.Toolbox(out_dir=out)
    b.synthesizer = synth
    return b


def _wav_file(tmp_path, freq=150):
    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    path = tmp_path / f"voice_{freq}.wav"
    save_wav_float(wav, path, sr)
    return path


class TestToolbox:
    def test_load_and_heatmap(self, box, tmp_path):
        utt = box.load_utterance(_wav_file(tmp_path))
        assert utt.embed.shape == (768,)
        assert box.save_embedding_heatmap(utt).exists()

    def test_projection(self, box, tmp_path):
        box.load_utterance(_wav_file(tmp_path, 150), "spkA")
        box.load_utterance(_wav_file(tmp_path, 300), "spkB")
        out = box.save_projection()
        assert out is not None and out.exists()

    def test_clone_and_rtf(self, box, tmp_path):
        utt = box.load_utterance(_wav_file(tmp_path))
        spec = box.synthesize("hello there", utt, seed=1)
        assert spec.shape[0] == 80
        wav, rtf = box.vocode(spec, seed=1)
        assert np.isfinite(wav).all()
        assert rtf > 0
        assert box.save_audio(wav, "clone_test").exists()

    def test_autotune_picks_best_seed(self, box, tmp_path):
        utt = box.load_utterance(_wav_file(tmp_path))
        seed, sim, wav = box.autotune("short text", utt, n_seeds=2)
        assert seed in (0, 1)
        assert -1.0 <= sim <= 1.0
        assert wav is not None
