"""Encoder inference API tests: partial slicing semantics + end-to-end embed."""
import numpy as np
import pytest

from rtvc_tpu.inference import encoder as enc
from rtvc_tpu.train.checkpoints import load_checkpoint, save_checkpoint


class TestPartialSlices:
    def test_reference_semantics_5s(self):
        """5 s @ 16 kHz → 160-frame windows, 80-frame step (50% overlap)."""
        wav_slices, mel_slices = enc.compute_partial_slices(5 * 16000)
        assert len(wav_slices) == len(mel_slices)
        for s in mel_slices:
            assert s.stop - s.start == 160
        steps = [s.start for s in mel_slices]
        assert all(b - a == 80 for a, b in zip(steps, steps[1:]))
        # wav slices are mel slices × 160 samples/frame
        assert wav_slices[0].stop == mel_slices[0].stop * 160

    def test_short_utterance_gets_one_slice(self):
        wav_slices, mel_slices = enc.compute_partial_slices(1000)
        assert len(mel_slices) == 1

    def test_low_coverage_tail_dropped(self):
        # 501 frames → last window [480, 640) covers only ~13% → dropped
        n_samples = 160 * 501 - 1
        _, mel_slices = enc.compute_partial_slices(n_samples)
        last = mel_slices[-1]
        coverage = (501 - last.start) / 160
        assert coverage >= 0.75


class TestEmbedUtterance:
    @pytest.fixture(autouse=True)
    def _model(self):
        enc.init_random_model(seed=0)
        yield

    def test_embed_shape_and_norm(self):
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(3 * 16000).astype(np.float32) * 0.1
        embed = enc.embed_utterance(wav)
        assert embed.shape == (768,)
        np.testing.assert_allclose(np.linalg.norm(embed), 1.0, atol=1e-5)

    def test_embed_without_partials(self):
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(2 * 16000).astype(np.float32) * 0.1
        embed = enc.embed_utterance(wav, using_partials=False)
        assert embed.shape == (768,)

    def test_return_partials(self):
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(4 * 16000).astype(np.float32) * 0.1
        embed, partials, slices = enc.embed_utterance(wav, return_partials=True)
        assert partials.shape[1] == 768
        assert len(slices) == partials.shape[0]

    def test_same_wav_same_embedding(self):
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(2 * 16000).astype(np.float32) * 0.1
        e1 = enc.embed_utterance(wav)
        e2 = enc.embed_utterance(wav)
        np.testing.assert_array_equal(e1, e2)

    def test_similar_voices_closer_than_different(self):
        """Two crops of one 'voice' (same spectral shape) should embed closer
        than structurally different audio."""
        sr = 16000
        t = np.arange(4 * sr) / sr
        rng = np.random.default_rng(1)
        voice_a = (
            0.5 * np.sin(2 * np.pi * 120 * t)
            + 0.3 * np.sin(2 * np.pi * 240 * t)
            + 0.05 * rng.standard_normal(len(t))
        ).astype(np.float32)
        voice_b = (
            0.4 * np.sin(2 * np.pi * 310 * t)
            + 0.2 * np.sin(2 * np.pi * 930 * t)
            + 0.3 * rng.standard_normal(len(t))
        ).astype(np.float32)
        ea1 = enc.embed_utterance(voice_a[: 2 * sr])
        ea2 = enc.embed_utterance(voice_a[2 * sr :])
        eb = enc.embed_utterance(voice_b[: 2 * sr])
        assert np.dot(ea1, ea2) > np.dot(ea1, eb)

    def test_embed_speaker(self):
        rng = np.random.default_rng(0)
        wavs = [rng.standard_normal(2 * 16000).astype(np.float32) * 0.1 for _ in range(3)]
        embed = enc.embed_speaker(wavs)
        assert embed.shape == (768,)
        np.testing.assert_allclose(np.linalg.norm(embed), 1.0, atol=1e-5)


class TestCheckpointRoundtrip:
    def test_save_load_and_embed(self, tmp_path):
        enc.init_random_model(seed=3)
        params = enc._params["params"]
        path = tmp_path / "encoder.ckpt"
        save_checkpoint(path, params, step=1234, model_type="speaker_encoder")

        ckpt = load_checkpoint(path)
        assert ckpt["step"] == 1234
        assert ckpt["model_type"] == "speaker_encoder"

        rng = np.random.default_rng(0)
        wav = rng.standard_normal(2 * 16000).astype(np.float32) * 0.1
        before = enc.embed_utterance(wav)
        enc.load_model(path)
        after = enc.embed_utterance(wav)
        np.testing.assert_allclose(before, after, atol=1e-6)

    def test_torch_checkpoint_import(self, tmp_path):
        """Reference-format torch .pt checkpoints load transparently."""
        import torch

        class _Ref(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.lstm = torch.nn.LSTM(40, 768, 3, batch_first=True)
                self.linear = torch.nn.Linear(768, 768)
                self.similarity_weight = torch.nn.Parameter(torch.tensor([10.0]))
                self.similarity_bias = torch.nn.Parameter(torch.tensor([-5.0]))

        torch.manual_seed(0)
        ref = _Ref()
        path = tmp_path / "encoder.pt"
        torch.save({"step": 77, "model_state": ref.state_dict()}, path)

        enc.load_model(path)
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(int(1.8 * 16000)).astype(np.float32) * 0.1
        embed = enc.embed_utterance(wav)

        # Oracle: same forward in torch
        wav_slices, mel_slices = enc.compute_partial_slices(len(wav))
        padded = np.pad(wav, (0, max(0, wav_slices[-1].stop - len(wav))))
        frames = enc.wav_to_mel_spectrogram(padded)
        batch = torch.from_numpy(np.stack([frames[s] for s in mel_slices]))
        with torch.no_grad():
            _, (h, _) = ref.lstm(batch)
            raw = torch.relu(ref.linear(h[-1]))
            partials = (raw / torch.norm(raw, dim=1, keepdim=True)).numpy()
        expected = partials.mean(axis=0)
        expected /= np.linalg.norm(expected)
        cos = float(np.dot(embed, expected))
        assert cos > 0.9999, cos
