"""Training-loop integration tests on synthetic on-disk datasets: all three
stages run end-to-end (data → collate → jitted step → checkpoint → resume)."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.config.vocoder import WaveRNNParams
from rtvc_tpu.models.speaker_encoder import SpeakerEncoder
from rtvc_tpu.train.pruning import (
    compute_prune_masks,
    count_pruned,
    cubic_sparsity,
    group_prune_mask,
)
from rtvc_tpu.train.trainer import (
    AnomalyDetector,
    linear_session_lr,
    train_encoder,
    train_synthesizer,
    train_vocoder,
)

pytestmark = pytest.mark.slow  # excluded from the quick gate (make test)


# ---------------------------------------------------------------------------
# Fixtures: synthetic datasets on disk
# ---------------------------------------------------------------------------


def _make_encoder_dataset(root, n_speakers=3, n_utts=4, n_frames=50, n_mels=8):
    rng = np.random.default_rng(0)
    for s in range(n_speakers):
        d = root / f"speaker_{s:02d}"
        d.mkdir(parents=True)
        arrays, lines = {}, []
        base = rng.standard_normal((1, n_mels))  # speaker signature
        for u in range(n_utts):
            name = f"frames_{u}.npy"
            arrays[name] = (
                base + 0.1 * rng.standard_normal((n_frames, n_mels))
            ).astype(np.float32)
            lines.append(f"{name},fake_{u}.wav")
        np.savez(d / "combined.npz", **arrays)
        (d / "_sources.txt").write_text("\n".join(lines) + "\n")
    return root


def _make_synth_dataset(root, n_utts=6, n_mels=80):
    """train.json + mels/ + embeds/ with the reference artifact contract."""
    from rtvc_tpu.config import synthesizer_paths as paths

    rng = np.random.default_rng(0)
    (root / paths.mel_dir).mkdir(parents=True)
    (root / paths.embed_dir).mkdir(parents=True)
    meta = {}
    lines = []
    for i in range(n_utts):
        uid = f"utt{i:03d}"
        frames = int(rng.integers(20, 30))
        mel = rng.uniform(-4, 4, (frames, n_mels)).astype(np.float32)  # stored (T, M)
        np.save(root / paths.mel_dir / f"mel-{uid}.npy", mel)
        embed = rng.standard_normal(768).astype(np.float32)
        embed /= np.linalg.norm(embed)
        np.save(root / paths.embed_dir / f"embed-{uid}.npy", embed)
        n_samples = frames * 200
        lines.append(f"{uid}|{n_samples}|{frames}|hello world number {i}")
    meta["speaker_0"] = lines
    (root / "train.json").write_text(json.dumps(meta))
    return root


def _make_vocoder_dataset(root, n_utts=4, n_mels=80, hp=None):
    rng = np.random.default_rng(0)
    mel_dir = root / "mels_gta"
    wav_dir = root / "wav"
    mel_dir.mkdir(parents=True)
    wav_dir.mkdir(parents=True)
    meta = {}
    for i in range(n_utts):
        uid = f"utt{i:03d}"
        frames = 40
        mel = rng.uniform(-4, 4, (frames, n_mels)).astype(np.float32)
        np.save(mel_dir / f"{uid}.npy", mel)
        wav = (0.5 * np.sin(np.linspace(0, 300, frames * 200))).astype(np.float32)
        np.save(wav_dir / f"audio-{uid}.npy", wav)
        meta[uid] = f"{uid}|{frames * 200}|{frames}|text"
    (root / "synthesized.json").write_text(json.dumps(meta))
    return root


# ---------------------------------------------------------------------------
# Unit pieces
# ---------------------------------------------------------------------------


class TestScheduleAndAnomaly:
    def test_linear_lr(self):
        assert linear_session_lr(1e-3, 1e-5, 0, 100) == pytest.approx(1e-3)
        assert linear_session_lr(1e-3, 1e-5, 99, 100) == pytest.approx(1e-5)
        mid = linear_session_lr(1e-3, 1e-5, 50, 101)
        assert 1e-5 < mid < 1e-3

    def test_anomaly_detector_trips_on_spike(self):
        det = AnomalyDetector(multiplier=6.0, warmup=5)
        for i in range(30):
            assert not det.check(1.0 + 0.01 * (i % 3))
        assert det.check(50.0)

    def test_anomaly_detector_raises_on_nan(self):
        det = AnomalyDetector()
        with pytest.raises(FloatingPointError):
            det.check(float("nan"))


class TestPruning:
    def test_cubic_ramp(self):
        assert float(cubic_sparsity(jnp.asarray(0), 0, 100, 0.9)) == 0.0
        assert float(cubic_sparsity(jnp.asarray(100), 0, 100, 0.9)) == pytest.approx(0.9)
        assert float(cubic_sparsity(jnp.asarray(1000), 0, 100, 0.9)) == pytest.approx(0.9)
        z50 = float(cubic_sparsity(jnp.asarray(50), 0, 100, 0.9))
        assert 0.7 < z50 < 0.9  # cubic ramps fast early

    def test_group_structure(self):
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.standard_normal((12, 16)), jnp.float32)
        mask = np.asarray(group_prune_mask(W, jnp.asarray(0.5), 4, 1))
        # group-of-4 blocks are all-kept or all-zero
        blocks = mask.reshape(12, 4, 4)
        assert ((blocks.sum(axis=2) == 0) | (blocks.sum(axis=2) == 4)).all()
        sparsity = 1.0 - mask.mean()
        assert 0.4 < sparsity < 0.6

    def test_gate_splits_independent(self):
        rng = np.random.default_rng(1)
        # gate 0 has tiny weights; with per-gate thresholds it must still
        # keep ~half its groups
        W = np.concatenate(
            [0.001 * rng.standard_normal((4, 8)), rng.standard_normal((8, 8))]
        )
        mask = np.asarray(
            group_prune_mask(jnp.asarray(W, jnp.float32), jnp.asarray(0.5), 4, 3)
        )
        assert mask[:4].mean() > 0.25  # not wiped out by the louder gates


# ---------------------------------------------------------------------------
# End-to-end loops
# ---------------------------------------------------------------------------


class TestEncoderTraining:
    def test_trains_and_resumes(self, tmp_path):
        from rtvc_tpu.data.ge2e_sampler import (
            SpeakerVerificationDataset,
            speaker_batch_iterator,
        )

        data_root = _make_encoder_dataset(tmp_path / "data")
        dataset = SpeakerVerificationDataset(data_root)
        it = speaker_batch_iterator(dataset, 3, 4, n_frames=20, prefetch=0, seed=0)

        model = SpeakerEncoder(
            model=EncoderModelParams(model_hidden_size=16, model_embedding_size=16),
            data=EncoderDataParams(mel_n_channels=8),
        )
        out = train_encoder(
            "testrun", it, tmp_path / "models", speakers_per_batch=3,
            utterances_per_speaker=4, learning_rate=1e-3, total_steps=6,
            save_every=3, eer_every=3, model=model,
        )
        assert out["step"] == 6
        assert np.isfinite(out["loss"])
        ckpt_path = tmp_path / "models" / "testrun" / "testrun.ckpt"
        assert ckpt_path.exists()

        # Resume continues from step 6
        it2 = speaker_batch_iterator(dataset, 3, 4, n_frames=20, prefetch=0, seed=1)
        out2 = train_encoder(
            "testrun", it2, tmp_path / "models", speakers_per_batch=3,
            utterances_per_speaker=4, learning_rate=1e-3, total_steps=9,
            save_every=3, model=model,
        )
        assert out2["step"] == 9

    def test_loss_decreases_on_separable_data(self, tmp_path):
        from rtvc_tpu.data.ge2e_sampler import (
            SpeakerVerificationDataset,
            speaker_batch_iterator,
        )

        data_root = _make_encoder_dataset(tmp_path / "data", n_speakers=4)
        dataset = SpeakerVerificationDataset(data_root)
        it = speaker_batch_iterator(dataset, 4, 3, n_frames=20, prefetch=0, seed=0)
        model = SpeakerEncoder(
            model=EncoderModelParams(model_hidden_size=16, model_embedding_size=16),
            data=EncoderDataParams(mel_n_channels=8),
        )
        losses = []
        metrics_dir = tmp_path / "models2"
        out = train_encoder(
            "sep", it, metrics_dir, speakers_per_batch=4,
            utterances_per_speaker=3, learning_rate=5e-3, total_steps=30,
            save_every=0, eer_every=0, model=model,
        )
        # read the TSV back
        tsv = (metrics_dir / "sep" / "metrics.tsv").read_text().splitlines()[1:]
        losses = [float(l.split("\t")[2]) for l in tsv if l.split("\t")[1] == "loss"]
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestSynthesizerTraining:
    def test_tacotron_sessions_and_resume(self, tmp_path):
        from rtvc_tpu.data.synthesizer_dataset import SynthesizerDataset, batch_iterator
        from rtvc_tpu.models import factories

        syn_dir = _make_synth_dataset(tmp_path / "syn")
        dataset = SynthesizerDataset(syn_dir, ["mel", "embed"])

        cfg = TacotronParams(
            embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
            encoder_K=2, lstm_dims=16, postnet_K=2, num_highways=2,
            tts_schedule=((2, 1, 3, 1e-3, 1e-4), (1, 1, 3, 1e-3, 1e-4)),
        )

        def epoch_batches(session_idx, r):
            return batch_iterator(dataset, batch_size=3, r=r, seed=session_idx)

        out = train_synthesizer(
            "syntest", factories.MODEL_TYPE_TACOTRON, syn_dir,
            tmp_path / "models", epoch_batches, save_every=2,
            eval_interval=0, max_steps=3, override_hp=cfg,
        )
        assert out["step"] == 3
        assert np.isfinite(out["loss"])

        # resume: continues into the schedule rather than restarting
        out2 = train_synthesizer(
            "syntest", factories.MODEL_TYPE_TACOTRON, syn_dir,
            tmp_path / "models", epoch_batches, save_every=2,
            eval_interval=0, max_steps=4, override_hp=cfg,
        )
        assert out2["step"] == 4


class TestVocoderTraining:
    def test_wavernn_with_pruning(self, tmp_path):
        from rtvc_tpu.data.vocoder_dataset import VocoderDataset, batch_iterator
        from rtvc_tpu.models import factories

        voc_cfg = WaveRNNParams(
            rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=16,
            res_blocks=1, seq_len=200 * 2, pad=2,
            voc_tts_schedule=((3, 1e-3, 1e-4, 2),),
            use_sparsification=True, start_prune=0, prune_steps=4,
            sparsity_target=0.5, sparsity_target_rnn=0.5,
            anomaly_detection=True,
        )
        root = _make_vocoder_dataset(tmp_path / "voc", hp=voc_cfg)
        dataset = VocoderDataset(
            root / "synthesized.json", root / "mels_gta", root / "wav", voc_cfg
        )

        def epoch_batches(session_idx):
            return batch_iterator(dataset, batch_size=2, hp=voc_cfg, seed=session_idx)

        out = train_vocoder(
            "voctest", factories.MODEL_TYPE_FATCHORD, tmp_path / "models",
            epoch_batches, save_every=2, max_steps=5, override_hp=voc_cfg,
        )
        assert out["step"] == 5
        assert np.isfinite(out["loss"])

        # pruning must actually have zeroed weights (ramp hits 0.5 by step 4)
        params = out["variables"]["params"]
        w = np.asarray(params["fc1"]["weight"])
        assert (w == 0).mean() > 0.3


class TestGTASynthesis:
    def test_run_synthesis_writes_gta_mels(self, tmp_path):
        from rtvc_tpu.config.synthesizer import TacotronParams
        from rtvc_tpu.models import factories
        from rtvc_tpu.train.gta import run_synthesis

        syn_dir = _make_synth_dataset(tmp_path / "syn")
        cfg = TacotronParams(
            embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
            encoder_K=2, lstm_dims=16, postnet_K=2, num_highways=2,
        )
        bundle = factories.init_syn_model(
            factories.MODEL_TYPE_TACOTRON, override_hp=cfg
        )
        voc_dir = tmp_path / "voc"
        n = run_synthesis(syn_dir, voc_dir, bundle, r=2, batch_size=3)
        assert n == 6
        import json as _json

        meta = _json.loads((voc_dir / "synthesized.json").read_text())
        assert len(meta) == 6
        # GTA mels readable by the vocoder dataset (stored (T, 80))
        import numpy as _np

        first = _np.load(next((voc_dir / "mels_gta").glob("*.npy")))
        assert first.shape[1] == 80

    def test_run_synthesis_multiprocess_shard_merge(self, tmp_path,
                                                    monkeypatch):
        """2-process GTA sharding simulated in one process: batch k goes to
        process k mod 2; each writes a partial JSON; the main process merges
        (ref contract: synthesizer/synthesize.py:154-196). Results must
        union to exactly the single-process output."""
        import json as _json

        import jax as _jax

        from rtvc_tpu.config.synthesizer import TacotronParams
        from rtvc_tpu.models import factories
        from rtvc_tpu.parallel import mesh as pmesh
        from rtvc_tpu.train.gta import run_synthesis

        syn_dir = _make_synth_dataset(tmp_path / "syn")
        cfg = TacotronParams(
            embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
            encoder_K=2, lstm_dims=16, postnet_K=2, num_highways=2,
        )
        bundle = factories.init_syn_model(
            factories.MODEL_TYPE_TACOTRON, override_hp=cfg
        )

        voc_dir = tmp_path / "voc"
        monkeypatch.setattr(_jax, "process_count", lambda: 2)
        monkeypatch.setattr(pmesh, "wait_for_everyone", lambda: None)

        counts = []
        for pid in (1, 0):  # run the non-main shard first: the merge (by
            # process 0) must still see process 1's part file
            monkeypatch.setattr(_jax, "process_index", lambda p=pid: p)
            counts.append(
                run_synthesis(syn_dir, voc_dir, bundle, r=2, batch_size=3)
            )

        assert sum(counts) == 6 and all(c > 0 for c in counts)
        meta = _json.loads((voc_dir / "synthesized.json").read_text())
        assert len(meta) == 6
        assert len(list((voc_dir / "mels_gta").glob("*.npy"))) == 6
