"""Preprocessing tests: DSP helpers (logmmse/pitch), DP duration extraction
vs a Dijkstra oracle, and the full 3-pass pipeline on a synthetic corpus."""
import json
from pathlib import Path

import numpy as np
import pytest

import jax

from rtvc_tpu.data.duration_extractor import (
    DurationExtractor,
    attention_scores,
    shortest_monotonic_path,
)
from rtvc_tpu.ops.logmmse import denoise, profile_noise
from rtvc_tpu.ops.pitch import estimate_f0


class TestLogMMSE:
    def test_improves_snr_on_stationary_noise(self):
        sr = 16000
        rng = np.random.default_rng(0)
        t = np.arange(2 * sr) / sr
        clean = 0.5 * np.sin(2 * np.pi * 300 * t).astype(np.float32)
        noise = 0.05 * rng.standard_normal(len(t)).astype(np.float32)
        noisy = clean + noise

        profile = profile_noise(noise[: sr // 2], sr)
        denoised = denoise(noisy, profile, eta=0)

        sl = slice(sr // 4, -sr // 4)

        def snr(x):
            n = x[sl] - clean[sl]
            return 10 * np.log10(np.mean(clean[sl] ** 2) / np.mean(n**2))

        assert snr(denoised) > snr(noisy) + 3

    def test_short_input_passthrough(self):
        profile = profile_noise(np.random.default_rng(0).standard_normal(4000), 16000)
        short = np.ones(10, np.float32)
        out = denoise(short, profile)
        assert out.shape == (10,)


class TestPitch:
    def test_tone_frequency(self):
        sr, hop = 16000, 200
        t = np.arange(sr) / sr
        wav = 0.5 * np.sin(2 * np.pi * 220 * t)
        f0 = estimate_f0(wav, sr, hop)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        assert abs(np.median(voiced) - 220) < 5

    def test_silence_is_unvoiced(self):
        sr, hop = 16000, 200
        wav = np.concatenate(
            [0.5 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr), np.zeros(sr)]
        )
        f0 = estimate_f0(wav, sr, hop)
        first, second = f0[: sr // hop], f0[sr // hop + 2 :]
        assert (second == 0).mean() > 0.9
        assert (first > 0).mean() > 0.7


class TestDurationExtraction:
    def test_dp_matches_dijkstra_oracle(self):
        """Oracle: the same right/down/diag grid solved with scipy Dijkstra
        (the reference's formulation, ref: duration_extractor.py:97-130)."""
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import dijkstra

        rng = np.random.default_rng(0)
        cost = rng.uniform(0.1, 1.0, (7, 5))
        T, C = cost.shape

        rows_i, cols_i, data = [], [], []

        def node(i, j):
            return i * C + j

        for i in range(T):
            for j in range(C):
                if j < C - 1:
                    rows_i.append(node(i, j)); cols_i.append(node(i, j + 1))
                    data.append(cost[i, j + 1])
                if i < T - 1:
                    rows_i.append(node(i, j)); cols_i.append(node(i + 1, j))
                    data.append(cost[i + 1, j])
                if i < T - 1 and j < C - 1:
                    rows_i.append(node(i, j)); cols_i.append(node(i + 1, j + 1))
                    data.append(cost[i + 1, j + 1])
        adj = coo_matrix((data, (rows_i, cols_i)), shape=(T * C, T * C)).tocsr()
        dist, _ = dijkstra(adj, directed=True, indices=0, return_predecessors=True)
        oracle_cost = dist[-1] + cost[0, 0]  # dijkstra omits the start cell

        path = shortest_monotonic_path(cost)
        dp_cost = sum(cost[i, j] for i, j in path)
        assert dp_cost == pytest.approx(oracle_cost)
        # path is monotonic, starts/ends correctly
        assert tuple(path[0]) == (0, 0) and tuple(path[-1]) == (T - 1, C - 1)
        diffs = np.diff(path, axis=0)
        assert ((diffs >= 0) & (diffs <= 1)).all()

    def test_durations_sum_to_mel_len(self):
        rng = np.random.default_rng(1)
        T_mel, T_text, n_mels = 24, 6, 4
        # near-diagonal attention
        att = np.zeros((T_mel, T_text))
        for i in range(T_mel):
            j = min(i * T_text // T_mel, T_text - 1)
            att[i, j] = 0.9
        att += 0.01 * rng.random((T_mel, T_text))
        mel = rng.uniform(-4, 4, (n_mels, T_mel)).astype(np.float32)
        tokens = np.asarray([5, 6, 7, 8, 9, 10], np.int32)

        extractor = DurationExtractor(silence_threshold=-11.0, silence_prob_shift=0.25)
        durations, score = extractor(tokens, mel, att)
        assert durations.sum() == T_mel
        assert 0 <= score <= 1
        # roughly uniform diagonal → each token gets ~T_mel/T_text frames
        assert (durations > 0).all()

    def test_attention_scores_perfect_diagonal(self):
        T_mel, T_text = 12, 12
        att = np.eye(T_mel)[None]  # perfectly sharp + monotonic
        loc, sharp = attention_scores(att, np.asarray([T_mel]))
        assert loc[0] == pytest.approx(1.0)
        assert sharp[0] == pytest.approx(1.0)


@pytest.mark.slow  # three full passes over a synthetic corpus (~40 s)
class TestFullPreprocessingPipeline:
    @pytest.fixture
    def corpus(self, tmp_path):
        """Synthetic 2-speaker wav corpus with transcripts."""
        from rtvc_tpu.utils.io import save_wav_float

        sr = 16000
        rng = np.random.default_rng(0)
        root = tmp_path / "datasets" / "TinyCorpus"
        for s in range(2):
            d = root / "speakers" / f"spk{s}"
            d.mkdir(parents=True)
            for u in range(2):
                t = np.arange(int(2.5 * sr)) / sr
                freq = 120 + 60 * s + 10 * u
                wav = (
                    0.4 * np.sin(2 * np.pi * freq * t)
                    + 0.2 * np.sin(2 * np.pi * 3 * freq * t)
                    + 0.01 * rng.standard_normal(len(t))
                ).astype(np.float32)
                save_wav_float(wav, d / f"utt{u}.wav", sr)
                (d / f"utt{u}.txt").write_text(f"sample text number {u}")
        return tmp_path

    def test_three_passes_and_dataset_load(self, corpus, tmp_path):
        from rtvc_tpu.config.synthesizer import TacotronParams
        from rtvc_tpu.data.synthesizer_dataset import SynthesizerDataset, collate_synthesizer
        from rtvc_tpu.data.synthesizer_preprocess import (
            create_align_features,
            create_embeddings,
            synthesizer_preprocess_dataset,
        )
        from rtvc_tpu.inference import encoder as enc
        from rtvc_tpu.inference.attention import TacotronAligner
        from rtvc_tpu.models import factories

        out_dir = tmp_path / "syn_out"
        out_dir.mkdir()

        # Pass 1: audio
        synthesizer_preprocess_dataset(
            corpus / "datasets", out_dir, "TinyCorpus", ["speakers"],
            [".wav"], ".txt", n_processes=2,
        )
        meta = json.loads((out_dir / "train.json").read_text())
        n_utts = sum(len(v) for v in meta.values())
        assert n_utts >= 3  # some utterances survive trimming
        assert len(list((out_dir / "mels").glob("mel-*.npy"))) == n_utts

        # Pass 2: embeddings (random-weight encoder)
        enc.init_random_model(seed=0)
        create_embeddings(out_dir, encoder_model_fpath=None, n_processes=2)
        assert len(list((out_dir / "embeds").glob("embed-*.npy"))) == n_utts

        # Pass 3: alignment features (tiny random tacotron)
        cfg = TacotronParams(
            embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
            encoder_K=2, lstm_dims=16, postnet_K=2, num_highways=2,
        )
        bundle = factories.init_syn_model(
            factories.MODEL_TYPE_TACOTRON, override_hp=cfg
        )
        aligner = TacotronAligner(bundle=bundle)
        create_align_features(out_dir, None, batch_hook=aligner)
        for d in ("duration", "attention", "alignment", "phoneme_pitch",
                  "phoneme_energy"):
            assert len(list((out_dir / d).glob("*.npy"))) == n_utts, d

        # The dataset layer can now serve ALL elements for NAR training
        dataset = SynthesizerDataset(
            out_dir,
            ["mel", "embed", "duration", "attention", "alignment",
             "phoneme_pitch", "phoneme_energy"],
        )
        batch = collate_synthesizer([dataset[i] for i in range(len(dataset))], r=1)
        assert batch["mels"].shape[0] == n_utts
        assert batch["durations"].shape == batch["phoneme_pitchs"].shape
        # durations sum ≈ mel frames per utterance
        for i in range(n_utts):
            assert batch["durations"][i].sum() <= batch["mels"].shape[2]

    def test_encoder_preprocess(self, corpus, tmp_path):
        from rtvc_tpu.data.encoder_preprocess import encoder_preprocess_dataset
        from rtvc_tpu.data.ge2e_sampler import SpeakerVerificationDataset

        out_dir = tmp_path / "enc_out"
        encoder_preprocess_dataset(
            corpus / "datasets", out_dir, ["TinyCorpus/speakers"],
            "TinyCorpus", extensions=(".wav",), n_threads=2,
        )
        npzs = list(out_dir.glob("*/combined.npz"))
        assert len(npzs) == 2
        # log file with stats exists
        assert (out_dir / "Log_TinyCorpus.txt").exists()
        # the GE2E sampler can read it back
        ds = SpeakerVerificationDataset(out_dir)
        batch = ds.speakers[0].random_partial(2, 20)
        assert batch[0][1].shape == (20, 40)


class TestArtifacts:
    def test_plots_render(self, tmp_path):
        from rtvc_tpu.utils.plots import (
            save_attention,
            save_mel_comparison,
            save_series_grid,
            save_spectrogram,
            save_wave_comparison,
        )

        rng = np.random.default_rng(0)
        att = rng.random((30, 10))
        mel = rng.uniform(-4, 4, (80, 30))
        assert save_attention(att, tmp_path / "att").exists()
        assert save_spectrogram(mel, tmp_path / "mel").exists()
        assert save_mel_comparison(mel, mel, tmp_path / "cmp").exists()
        assert save_series_grid(
            [rng.random(20), rng.random(20)], ["a", "b"], tmp_path / "grid"
        ).exists()
        assert save_wave_comparison(
            [rng.random(100) * 2 - 1] * 3, ["t", "g", "w"], tmp_path / "wave"
        ).exists()

    def test_gen_testset(self, tmp_path):
        from rtvc_tpu.config.vocoder import WaveRNNParams
        from rtvc_tpu.data.vocoder_dataset import VocoderDataset
        from rtvc_tpu.models import factories
        from rtvc_tpu.train.gen_testset import gen_testset
        from tests.test_training import _make_vocoder_dataset

        cfg = WaveRNNParams(
            rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=16,
            res_blocks=1, bits=6, gen_target=400, gen_overlap=200,
        )
        root = _make_vocoder_dataset(tmp_path / "voc")
        bundle = factories.init_voc_model(
            factories.MODEL_TYPE_FATCHORD, override_hp=cfg
        )
        dataset = VocoderDataset(
            root / "synthesized.json", root / "mels_gta", root / "wav", cfg
        )
        gen_testset(
            bundle.variables, bundle.dims, cfg, dataset,
            tmp_path / "samples", step=100, samples=1,
        )
        files = sorted(p.name for p in (tmp_path / "samples").glob("*"))
        assert "100_0_target.wav" in files
        assert "100_0_griffinlim.wav" in files
        assert "100_0_generated.wav" in files
        assert "100_0_compare.png" in files

    def test_textgrid_parser(self, tmp_path):
        import sys
        sys.path.insert(0, str(Path("scripts").resolve()))
        from textgrid_to_alignments import parse_textgrid_words

        tg = '''File type = "ooTextFile"
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        intervals [1]:
            xmin = 0.0
            xmax = 0.5
            text = ""
        intervals [2]:
            xmin = 0.5
            xmax = 1.2
            text = "hello"
        intervals [3]:
            xmin = 1.2
            xmax = 1.4
            text = ""
'''
        words, ends = parse_textgrid_words(tg)
        assert words == ["", "hello", ""]
        assert ends == [0.5, 1.2, 1.4]
