"""Native C++ engine tests: build, export, and deterministic (argmax)
cross-implementation parity against the JAX path."""
import subprocess
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtvc_tpu.models.wavernn import (
    VOC_FATCHORD,
    VOC_GENEING,
    VOC_RUNTIMERACER,
    WaveRNNDims,
    generate_core,
    init_wavernn,
    upsample_forward,
)
from rtvc_tpu.native.convert import export_wavernn

pytestmark = pytest.mark.slow  # compile-heavy; full gate only

NATIVE_DIR = Path(__file__).resolve().parents[1] / "rtvc_tpu" / "native"
LIB = NATIVE_DIR / "build" / "librtvc_wavernn.so"


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not LIB.exists():
        subprocess.run([str(NATIVE_DIR / "build.sh")], check=True)
    yield


def _dims(variant, mode="RAW", bits=6):
    return WaveRNNDims(
        variant=variant, mode=mode, rnn_dims=16, fc_dims=16, bits=bits, pad=2,
        upsample_factors=(2, 2, 5), feat_dims=10, compute_dims=8,
        res_out_dims=16, res_blocks=2, hop_length=20, sample_rate=1000,
    )


def _jax_argmax_generate(variables, d, mel):
    mels = jnp.asarray(mel[None])
    mels = jnp.pad(mels, ((0, 0), (0, 0), (d.pad, d.pad)))
    mu, aux, _ = upsample_forward(
        variables["params"]["upsample"], variables["batch_stats"]["upsample"],
        d, mels, train=False,
    )
    return np.asarray(
        generate_core(variables, d, mu, aux, jax.random.PRNGKey(0), argmax=True)
    )[0]


def _native_generate(weights_path, mel, argmax=True, seed=3):
    from rtvc_tpu.native.libwavernn import _Instance, _load_lib

    lib = _load_lib()
    inst = _Instance(lib, weights_path)
    inst.set_seed(seed)
    return inst.mel_to_wav(mel, argmax=argmax)


class TestNativeParity:
    @pytest.mark.parametrize(
        "variant,mode",
        [
            (VOC_RUNTIMERACER, "RAW"),
            (VOC_FATCHORD, "RAW"),
            (VOC_GENEING, "BITS"),
        ],
    )
    def test_argmax_waveform_matches_jax(self, tmp_path, variant, mode):
        d = _dims(variant, mode)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        weights = tmp_path / "model.bin"
        export_wavernn(variables, d, weights)

        rng = np.random.default_rng(0)
        mel = rng.uniform(-1, 1, (d.feat_dims, 12)).astype(np.float32)

        expected = _jax_argmax_generate(variables, d, mel)
        got = _native_generate(weights, mel, argmax=True)

        assert got.shape == expected.shape, (got.shape, expected.shape)
        # greedy decode: identical label choices → identical samples
        mismatches = np.mean(got != expected.astype(np.float32))
        np.testing.assert_allclose(got, expected, atol=2e-4)
        assert mismatches < 0.05 or np.allclose(got, expected, atol=1e-5)

    def test_sparse_export_roundtrip(self, tmp_path):
        """Pruned (group-sparse) weights export compactly and still match."""
        from rtvc_tpu.train.pruning import apply_prune_masks, compute_prune_masks

        d = _dims(VOC_RUNTIMERACER)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        masks = compute_prune_masks(
            variables["params"], d, jnp.asarray(100), 0, 100, 0.7, 0.7, 4
        )
        variables = {
            "params": apply_prune_masks(variables["params"], masks),
            "batch_stats": variables["batch_stats"],
        }
        dense_path = tmp_path / "dense.bin"
        export_wavernn(variables, d, dense_path)

        rng = np.random.default_rng(1)
        mel = rng.uniform(-1, 1, (d.feat_dims, 10)).astype(np.float32)
        expected = _jax_argmax_generate(variables, d, mel)
        got = _native_generate(dense_path, mel, argmax=True)
        np.testing.assert_allclose(got, expected, atol=2e-4)

    def test_stochastic_seed_determinism(self, tmp_path):
        d = _dims(VOC_RUNTIMERACER)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        weights = tmp_path / "model.bin"
        export_wavernn(variables, d, weights)
        mel = np.random.default_rng(0).uniform(-1, 1, (d.feat_dims, 8)).astype(np.float32)
        w1 = _native_generate(weights, mel, argmax=False, seed=42)
        w2 = _native_generate(weights, mel, argmax=False, seed=42)
        w3 = _native_generate(weights, mel, argmax=False, seed=43)
        np.testing.assert_array_equal(w1, w2)
        assert not np.array_equal(w1, w3)


class TestVocoderWrapper:
    def test_vocode_mel_end_to_end(self, tmp_path):
        """Full wrapper path: fold → native chunks → unfold → decode."""
        from rtvc_tpu.config.vocoder import WaveRNNParams
        from rtvc_tpu.models import factories
        from rtvc_tpu.native import libwavernn

        cfg = WaveRNNParams(
            rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=16,
            res_blocks=2, bits=6, gen_target=400, gen_overlap=200,
        )
        bundle = factories.init_voc_model(
            factories.MODEL_TYPE_RUNTIMERACER, override_hp=cfg
        )
        weights = tmp_path / "voc.bin"
        export_wavernn(bundle.variables, bundle.dims, weights)

        voc = libwavernn.Vocoder(weights, "runtimeracer-wavernn", verbose=False)
        voc.cfg = cfg
        voc.load(n_threads=2)
        voc.setRandomSeed(7)

        mel = np.random.default_rng(0).uniform(-4, 4, (80, 30)).astype(np.float32)
        wav = voc.vocode_mel(mel, normalize=True)
        assert wav.shape == ((30 - 1) * 200,)
        assert np.isfinite(wav).all()

    def test_cli_tool(self, tmp_path):
        import struct

        d = _dims(VOC_RUNTIMERACER)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        weights = tmp_path / "model.bin"
        export_wavernn(variables, d, weights)
        mel = np.random.default_rng(0).uniform(-1, 1, (d.feat_dims, 8)).astype(np.float32)
        mel_path = tmp_path / "mel.raw"
        with open(mel_path, "wb") as f:
            f.write(struct.pack("<ii", *mel.shape))
            f.write(np.ascontiguousarray(mel).tobytes())
        out_path = tmp_path / "out.raw"
        res = subprocess.run(
            [str(NATIVE_DIR / "build" / "rtvc_vocoder"), "-w", str(weights),
             "-m", str(mel_path), "-o", str(out_path), "--argmax"],
            capture_output=True, text=True,
        )
        assert res.returncode == 0, res.stderr
        wav = np.fromfile(out_path, dtype=np.float32)
        assert len(wav) == 8 * d.hop_length


class TestPublicVocoderAPI:
    def test_load_model_libwavernn_and_infer(self, tmp_path, monkeypatch):
        """Full public-API path: checkpoint → convert → load_model(
        voc_type='libwavernn') → infer_waveform."""
        from rtvc_tpu.config.vocoder import WaveRNNParams
        from rtvc_tpu.inference import vocoder as voc_api
        from rtvc_tpu.models import factories
        from rtvc_tpu.train.checkpoints import save_checkpoint

        cfg = WaveRNNParams(
            rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=16,
            res_blocks=1, bits=6, gen_target=400, gen_overlap=200,
        )
        bundle = factories.init_voc_model(
            factories.MODEL_TYPE_RUNTIMERACER, override_hp=cfg
        )
        ckpt = tmp_path / "voc.ckpt"
        save_checkpoint(
            ckpt, bundle.variables["params"], step=1,
            model_type=factories.MODEL_TYPE_RUNTIMERACER,
            extras={"batch_stats": bundle.variables["batch_stats"],
                    "config": cfg.asdict()},
        )
        # convert via the CLI module logic
        import subprocess
        import sys

        res = subprocess.run(
            [sys.executable, str(NATIVE_DIR.parents[1] / "vocoder_convert_model.py"),
             str(ckpt), "-o", str(tmp_path / "voc.bin")],
            capture_output=True, text=True,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(NATIVE_DIR.parents[1]) + ":/root/.axon_site",
                 "HOME": "/root"},
        )
        assert res.returncode == 0, res.stderr[-500:]

        voc_api.load_model(tmp_path / "voc.bin", voc_type="libwavernn",
                           verbose=False)
        # the native wrapper defaults to the full runtimeracer hparams;
        # point it at the tiny test config
        voc_api._cpp_model.cfg = cfg
        assert voc_api.is_loaded()
        mel = np.random.default_rng(0).uniform(-4, 4, (80, 20)).astype(np.float32)
        wav = voc_api.infer_waveform(mel)
        assert wav.shape == ((20 - 1) * 200,)
        assert np.isfinite(wav).all()
        # reset module state for other tests
        voc_api._cpp_model = None
        voc_api._model_type = None

    def test_load_model_plumbs_native_batch(self, monkeypatch):
        """load_model(native_batch=N) must hand N to the engine wrapper as
        its lockstep batch (the public opt-in for single-core real-time)."""
        from rtvc_tpu.inference import vocoder as voc_api
        from rtvc_tpu.native import libwavernn

        seen = {}

        class FakeVocoder:
            def __init__(self, path, model_type, verbose=True, batch=1,
                         **kw):
                seen.update(path=str(path), model_type=model_type,
                            batch=batch)

            def load(self):
                seen["loaded"] = True

        monkeypatch.setattr(libwavernn, "Vocoder", FakeVocoder)
        voc_api.load_model("weights.bin", voc_type="libwavernn",
                           verbose=False, native_batch=4)
        assert seen == {"path": "weights.bin",
                        "model_type": "runtimeracer-wavernn",
                        "batch": 4, "loaded": True}
        voc_api._cpp_model = None
        voc_api._model_type = None


class TestMulticoreFanOut:
    """The per-core fan-out is the reference's entire CPU deployment story
    (ref: vocoder/libwavernn/inference.py:37-114) — prove the
    chunk-assignment + crossfade path and thread-safety by asserting the
    threaded pool reproduces the sequential computation bit-exactly.

    This box has 1 core (nproc=1), so n_instances>=2 runs oversubscribed —
    which is exactly the interesting regime for thread-safety: the OS
    preempts workers mid-chunk, so any shared mutable state (the static-RNG
    race the reference engine actually has, ref: wavernn.cpp rand state)
    would corrupt the argmax-deterministic output.
    """

    @pytest.fixture(scope="class")
    def exported(self, tmp_path_factory):
        from rtvc_tpu.config.vocoder import WaveRNNParams
        from rtvc_tpu.models import factories

        # gen_target=800 / hop=200 -> 4-frame chunk target, 1-frame overlap
        cfg = WaveRNNParams(
            rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=16,
            res_blocks=1, bits=6, gen_target=800, gen_overlap=200,
        )
        bundle = factories.init_voc_model(
            factories.MODEL_TYPE_RUNTIMERACER, override_hp=cfg
        )
        weights = tmp_path_factory.mktemp("fanout") / "voc.bin"
        export_wavernn(bundle.variables, bundle.dims, weights)
        return weights, cfg

    def _vocoder(self, weights, cfg, n):
        from rtvc_tpu.native import libwavernn

        voc = libwavernn.Vocoder(weights, "runtimeracer-wavernn",
                                 verbose=False)
        voc.cfg = cfg
        voc.load(n_threads=n)
        voc.setRandomSeed(7)
        return voc

    def test_pool_size_invariance(self, exported):
        """Same chunking (8 frames, 4-frame target for both pool sizes):
        2-worker and 4-worker pools must emit identical waveforms."""
        weights, cfg = exported
        mel = np.random.default_rng(0).uniform(-1, 1, (80, 8)).astype(
            np.float32
        )
        w2 = self._vocoder(weights, cfg, 2).vocode_mel(
            mel, normalize=False, argmax=True
        )
        w4 = self._vocoder(weights, cfg, 4).vocode_mel(
            mel, normalize=False, argmax=True
        )
        assert w2.shape == ((8 - 1) * 200,)
        np.testing.assert_array_equal(w2, w4)

    def test_threaded_equals_sequential_oracle(self, exported):
        """3 chunks across 3 concurrent workers == the same fold run
        sequentially on ONE instance (the strongest fan-out contract)."""
        import jax.numpy as jnp

        from rtvc_tpu.config import sp
        from rtvc_tpu.native.libwavernn import (
            _Instance,
            _load_lib,
            fold_mel_with_overlap,
            unfold_with_overlap,
        )
        from rtvc_tpu.ops.audio import de_emphasis, decode_mu_law

        weights, cfg = exported
        n_frames = 12
        mel = np.random.default_rng(1).uniform(
            -1, 1, (80, n_frames)
        ).astype(np.float32)

        voc = self._vocoder(weights, cfg, 3)
        # 12 frames / 3 workers -> target max(4, 4) = 4 -> 3 chunks, one
        # per worker, all in flight on the thread pool at once
        threaded = voc.vocode_mel(mel, normalize=False, argmax=True)

        # Sequential oracle: identical fold parameters, one instance
        inst = _Instance(_load_lib(), weights)
        hop = inst.hop
        target_frames = max(cfg.gen_target // hop, -(-n_frames // 3))
        overlap_frames = max(cfg.gen_overlap // hop, 1)
        chunks = fold_mel_with_overlap(mel, target_frames, overlap_frames)
        assert len(chunks) == 3, [c[0] for c in chunks]
        results = [
            (off, inst.mel_to_wav(chunk, argmax=True))
            for off, chunk in chunks
        ]
        wav = unfold_with_overlap(
            results, n_frames * hop, hop, overlap_frames
        )
        wav = np.asarray(
            decode_mu_law(jnp.asarray(wav, jnp.float32), 2 ** cfg.bits,
                          from_labels=False),
            dtype=np.float64,
        )
        wav = np.asarray(
            de_emphasis(jnp.asarray(wav, jnp.float32), sp.preemphasis),
            dtype=np.float64,
        )
        wav = wav[: (n_frames - 1) * hop]
        fade_len = min(20 * hop, len(wav))
        wav[-fade_len:] *= np.linspace(1.0, 0.0, fade_len)

        np.testing.assert_array_equal(threaded, wav)


class TestNativeRobustness:
    def test_corrupt_weights_raise_cleanly(self, tmp_path):
        """Garbage weight files must raise, not crash the process."""
        from rtvc_tpu.native.libwavernn import _Instance, _load_lib

        lib = _load_lib()
        bad = tmp_path / "garbage.bin"
        bad.write_bytes(b"\xde\xad\xbe\xef" * 256)
        with pytest.raises(RuntimeError, match="Failed to load"):
            _Instance(lib, bad)

    def test_missing_weights_raise(self, tmp_path):
        from rtvc_tpu.native.libwavernn import Vocoder

        with pytest.raises(FileNotFoundError):
            Vocoder(tmp_path / "nope.bin", "runtimeracer-wavernn",
                    verbose=False).load(n_threads=1)


class TestF16Weights:
    """fp16 weight storage (round 4): the per-sample loop is
    DRAM-bandwidth-bound, so the converter can store I/GRU/FC weights as
    IEEE half and the engine converts in registers (F16C). Decode must
    stay effectively identical to the f32-weight decode."""

    def test_f16_decode_matches_f32(self, tmp_path):
        d = _dims(VOC_RUNTIMERACER, "RAW")
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        w32 = tmp_path / "m32.bin"
        w16 = tmp_path / "m16.bin"
        export_wavernn(variables, d, w32)
        export_wavernn(variables, d, w16, weight_dtype="f16")
        assert w16.stat().st_size < w32.stat().st_size

        rng = np.random.default_rng(3)
        mel = rng.uniform(-1, 1, (d.feat_dims, 12)).astype(np.float32)
        a = _native_generate(w32, mel, argmax=True)
        b = _native_generate(w16, mel, argmax=True)
        assert a.shape == b.shape
        # greedy labels under fp16-rounded weights: near-total agreement
        # (same bar as the TPU bf16-stream guard)
        agree = float(np.mean(a == b))
        assert agree > 0.95, agree

    def test_f16_sparse_decode_matches_f32(self, tmp_path):
        from rtvc_tpu.train.pruning import (
            apply_prune_masks,
            compute_prune_masks,
        )

        d = _dims(VOC_RUNTIMERACER, "RAW")
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        masks = compute_prune_masks(
            variables["params"], d, jnp.asarray(100), 0, 100, 0.8, 0.8, 4
        )
        variables = {
            "params": apply_prune_masks(variables["params"], masks),
            "batch_stats": variables["batch_stats"],
        }
        w32 = tmp_path / "s32.bin"
        w16 = tmp_path / "s16.bin"
        export_wavernn(variables, d, w32, sparse_threshold=0.3)
        export_wavernn(variables, d, w16, sparse_threshold=0.3,
                       weight_dtype="f16")
        assert w16.stat().st_size < w32.stat().st_size
        rng = np.random.default_rng(4)
        mel = rng.uniform(-1, 1, (d.feat_dims, 12)).astype(np.float32)
        a = _native_generate(w32, mel, argmax=True)
        b = _native_generate(w16, mel, argmax=True)
        agree = float(np.mean(a == b))
        assert agree > 0.95, agree


class TestBatchedDecode:
    """In-instance lockstep batching (round 4): B fold chunks advance
    together, each weight matrix traversed once per step for the batch."""

    def _export(self, tmp_path):
        d = _dims(VOC_RUNTIMERACER, "RAW")
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        weights = tmp_path / "m.bin"
        export_wavernn(variables, d, weights)
        return d, weights

    def test_identical_mels_stay_in_lockstep(self, tmp_path):
        """A batch of B copies of one mel must emit B identical waveforms
        — every chunk runs the same arithmetic in lockstep, so any
        cross-chunk state bleed shows up immediately."""
        from rtvc_tpu.native.libwavernn import _Instance, _load_lib

        d, weights = self._export(tmp_path)
        inst = _Instance(_load_lib(), weights)
        mel = np.random.default_rng(5).uniform(
            -1, 1, (d.feat_dims, 10)).astype(np.float32)
        wavs = inst.mel_to_wav_batch(np.stack([mel, mel, mel]), argmax=True)
        assert wavs.shape[0] == 3
        np.testing.assert_array_equal(wavs[0], wavs[1])
        np.testing.assert_array_equal(wavs[0], wavs[2])

    def test_batched_matches_single_decodes(self, tmp_path):
        """Distinct mels decoded as one batch ≈ their individual decodes
        (greedy): the lockstep kernels reduce in a different FMA order, so
        allow a rare last-ulp label flip but require near-total agreement."""
        from rtvc_tpu.native.libwavernn import _Instance, _load_lib

        d, weights = self._export(tmp_path)
        inst = _Instance(_load_lib(), weights)
        rng = np.random.default_rng(6)
        mels = rng.uniform(-1, 1, (3, d.feat_dims, 10)).astype(np.float32)
        batched = inst.mel_to_wav_batch(mels, argmax=True)
        for b in range(3):
            single = inst.mel_to_wav(mels[b], argmax=True)
            assert single.shape == batched[b].shape
            agree = float(np.mean(single == batched[b]))
            assert agree > 0.999, (b, agree)

    def test_vocoder_batch_mode_end_to_end(self, tmp_path, monkeypatch):
        """Vocoder(batch=3) folds, lockstep-decodes, and crossfades a long
        mel; the batched entry point must ACTUALLY run (spy), and the
        result must agree with the per-chunk default mode."""
        from rtvc_tpu.config.vocoder import WaveRNNParams
        from rtvc_tpu.native.libwavernn import Vocoder, _Instance

        d, weights = self._export(tmp_path)
        # 24 frames with target max(4, ceil(24/3)) = 8 and overlap 2
        # → multiple equal chunks, so the lockstep branch engages
        mel = np.random.default_rng(7).uniform(
            -1, 1, (d.feat_dims, 24)).astype(np.float32)

        calls = {"batch": 0}
        orig = _Instance.mel_to_wav_batch

        def spy(self, mels, argmax=False):
            calls["batch"] += 1
            return orig(self, mels, argmax=argmax)

        monkeypatch.setattr(_Instance, "mel_to_wav_batch", spy)

        def make(batch, n_threads=None):
            v = Vocoder(weights, "runtimeracer-wavernn", verbose=False,
                        batch=batch)
            v.cfg = WaveRNNParams(
                mode=d.mode, bits=10, mu_law=True,
                gen_target=4 * d.hop_length, gen_overlap=2 * d.hop_length,
            )
            v.load(n_threads=n_threads)
            v.setRandomSeed(0)
            return v

        vb = make(3, n_threads=1)  # pin: chunk sizing scales with the pool
        assert len(vb._instances) == 1
        w_batched = vb.vocode_mel(mel, normalize=False, argmax=True)
        assert calls["batch"] >= 1, "lockstep path never engaged"
        # same fold (3 chunks) decoded per-chunk on a 3-thread pool: the
        # comparison isolates lockstep-vs-single decode, not chunking
        w_plain = make(1, n_threads=3).vocode_mel(
            mel, normalize=False, argmax=True
        )
        assert w_batched.shape == w_plain.shape == ((24 - 1) * d.hop_length,)
        agree = float(np.mean(np.isclose(w_batched, w_plain, atol=1e-6)))
        assert agree > 0.99, agree

    def test_f16_lockstep_composes(self, tmp_path):
        """f16 weights + lockstep batching go through the dedicated
        f16 multi-kernel: B identical mels stay in lockstep and agree
        with the single-chunk f16 decode."""
        from rtvc_tpu.native.libwavernn import _Instance, _load_lib

        d = _dims(VOC_RUNTIMERACER, "RAW")
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        weights = tmp_path / "m16.bin"
        export_wavernn(variables, d, weights, weight_dtype="f16")
        inst = _Instance(_load_lib(), weights)
        mel = np.random.default_rng(9).uniform(
            -1, 1, (d.feat_dims, 10)).astype(np.float32)
        wavs = inst.mel_to_wav_batch(np.stack([mel, mel]), argmax=True)
        np.testing.assert_array_equal(wavs[0], wavs[1])
        single = inst.mel_to_wav(mel, argmax=True)
        agree = float(np.mean(single == wavs[0]))
        assert agree > 0.999, agree

    def test_lockstep_composes_with_fanout(self, tmp_path, monkeypatch):
        """Lockstep batching composed with the instance fan-out: batch=2
        over a 3-instance pool lanes sub-batches across instances (M x B
        chains). Oversubscribed on this 1-core box — the OS preempts lanes
        mid-chunk, so any cross-instance shared state would corrupt the
        argmax-deterministic output. Oracle: the identical Vocoder with
        the thread pool replaced by a serial executor (same chunking,
        same grouping, same laning — only the concurrency differs)."""
        import rtvc_tpu.native.libwavernn as lw
        from rtvc_tpu.config.vocoder import WaveRNNParams
        from rtvc_tpu.native.libwavernn import Vocoder, _Instance

        d, weights = self._export(tmp_path)
        # gen_target 4 frames < ceil(40/6)=7 -> target 7, size 9, step 8:
        # chunks 9,9,9,9,8 -> subs [2,2,1] over 3 lanes (2 true batches)
        mel = np.random.default_rng(11).uniform(
            -1, 1, (d.feat_dims, 40)).astype(np.float32)

        used = set()
        orig = _Instance.mel_to_wav_batch

        def spy(self, mels, argmax=False):
            used.add(id(self))
            return orig(self, mels, argmax=argmax)

        monkeypatch.setattr(_Instance, "mel_to_wav_batch", spy)

        def make():
            v = Vocoder(weights, "runtimeracer-wavernn", verbose=False,
                        batch=2)
            v.cfg = WaveRNNParams(
                mode=d.mode, bits=10, mu_law=True,
                gen_target=4 * d.hop_length, gen_overlap=1 * d.hop_length,
            )
            v.load(n_threads=3)
            v.setRandomSeed(0)
            return v

        w_threaded = make().vocode_mel(mel, normalize=False, argmax=True)
        assert len(used) >= 2, "sub-batches never laned across instances"

        class SerialPool:
            def __init__(self, max_workers=None):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def map(self, fn, it):
                return [fn(x) for x in it]

        monkeypatch.setattr(lw, "ThreadPoolExecutor", SerialPool)
        w_serial = make().vocode_mel(mel, normalize=False, argmax=True)
        np.testing.assert_array_equal(w_threaded, w_serial)
