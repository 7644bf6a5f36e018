"""Epoch re-randomization regression tests (quick gate, pure numpy).

The reference trains through torch DataLoaders whose samplers and random
crops re-randomize EVERY epoch (ref: vocoder/train.py:126-133,
synthesizer/train.py:172-180). A round-5 TPU quality run exposed what
happens when they don't: the vocoder trainer re-built its batch_iterator
with the same seed each epoch, saw only ~8 fixed 800-sample crops for 2500
steps, memorized them (CE ≈ 1 on the crops, CE ≈ 175 — confidently wrong —
elsewhere) and free-ran at ~34 dB MCD. These tests pin the fixed contract:
one batch_iterator per session, and each successive ``__iter__`` yields a
fresh shuffle + fresh crop offsets.
"""
import json

import numpy as np


from rtvc_tpu.config.vocoder import WaveRNNParams


def _vocoder_dataset(root, n_utts=6, n_mels=80):
    rng = np.random.default_rng(0)
    mel_dir, wav_dir = root / "mels_gta", root / "wav"
    mel_dir.mkdir(parents=True)
    wav_dir.mkdir(parents=True)
    meta = {}
    for i in range(n_utts):
        uid = f"utt{i:03d}"
        frames = 40
        mel = rng.uniform(-4, 4, (frames, n_mels)).astype(np.float32)
        np.save(mel_dir / f"{uid}.npy", mel)
        wav = (0.5 * np.sin(np.linspace(0, 300, frames * 200))).astype(
            np.float32
        )
        np.save(wav_dir / f"audio-{uid}.npy", wav)
        meta[uid] = f"{uid}|{frames * 200}|{frames}|text"
    (root / "synthesized.json").write_text(json.dumps(meta))
    return root


class TestVocoderEpochs:
    def test_fresh_crops_every_epoch(self, tmp_path):
        from rtvc_tpu.data.vocoder_dataset import VocoderDataset, batch_iterator

        hp = WaveRNNParams(seq_len=200 * 2, pad=2)
        root = _vocoder_dataset(tmp_path)
        ds = VocoderDataset(
            root / "synthesized.json", root / "mels_gta", root / "wav", hp
        )
        it = batch_iterator(ds, batch_size=2, hp=hp, seed=0)
        assert len(it) == 3

        epoch1 = list(it)
        epoch2 = list(it)
        assert len(epoch1) == len(epoch2) == 3
        # same static shapes (one compiled step graph per session)...
        assert epoch1[0]["mels"].shape == epoch2[0]["mels"].shape
        # ...but different content: new shuffle order and new crop offsets
        m1 = np.concatenate([b["mels"].ravel() for b in epoch1])
        m2 = np.concatenate([b["mels"].ravel() for b in epoch2])
        assert not np.array_equal(m1, m2)

    def test_same_seed_same_sequence(self, tmp_path):
        """Two iterators with one seed stay in lockstep across epochs —
        the multi-process DP determinism contract."""
        from rtvc_tpu.data.vocoder_dataset import VocoderDataset, batch_iterator

        hp = WaveRNNParams(seq_len=200 * 2, pad=2)
        root = _vocoder_dataset(tmp_path)
        ds = VocoderDataset(
            root / "synthesized.json", root / "mels_gta", root / "wav", hp
        )
        a = batch_iterator(ds, batch_size=2, hp=hp, seed=7)
        b = batch_iterator(ds, batch_size=2, hp=hp, seed=7)
        for _ in range(2):  # both epochs identical across instances
            for ba, bb in zip(a, b):
                np.testing.assert_array_equal(ba["mels"], bb["mels"])
                np.testing.assert_array_equal(ba["y"], bb["y"])


class TestSynthesizerEpochs:
    def test_fresh_shuffle_every_epoch(self, tmp_path):
        from rtvc_tpu.config import synthesizer_paths as paths
        from rtvc_tpu.data.synthesizer_dataset import (
            SynthesizerDataset,
            batch_iterator,
        )

        rng = np.random.default_rng(0)
        (tmp_path / paths.mel_dir).mkdir(parents=True)
        (tmp_path / paths.embed_dir).mkdir(parents=True)
        lines = []
        for i in range(8):
            uid = f"u{i:03d}"
            frames = 20 + 2 * i
            np.save(
                tmp_path / paths.mel_dir / f"mel-{uid}.npy",
                rng.uniform(-4, 4, (frames, 80)).astype(np.float32),
            )
            np.save(
                tmp_path / paths.embed_dir / f"embed-{uid}.npy",
                rng.standard_normal(256).astype(np.float32),
            )
            lines.append(
                f"{uid}|{frames * 200}|{frames}|hello world number {i}"
            )
        (tmp_path / paths.metadata_file).write_text(
            json.dumps({"speaker_0": lines})
        )

        ds = SynthesizerDataset(tmp_path, ["mel", "embed"])
        it = batch_iterator(ds, batch_size=1, r=2, seed=0)
        order1 = [b["indices"].tolist() for b in it]
        order2 = [b["indices"].tolist() for b in it]
        assert sorted(map(tuple, order1)) == sorted(map(tuple, order2))
        # 8 batches: P(identical permutation twice) = 1/40320
        assert order1 != order2
