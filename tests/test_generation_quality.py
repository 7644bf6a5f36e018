"""Fold-with-overlap quality validation (the TPU-tuned small windows must
not corrupt audio): overfit a tiny WaveRNN on a perfectly predictable
waveform, then compare batched (fold + crossfade) against unbatched greedy
decodes across window configs with rtvc_tpu.utils.genquality."""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from rtvc_tpu.ops.audio import float_2_label, label_2_float
from rtvc_tpu.train.steps import make_wavernn_train_step
from rtvc_tpu.utils.genquality import fold_fidelity

pytestmark = pytest.mark.slow  # trains a model (~1 min on the CI box)

BITS = 6
HOP = 20


def _make_overfit_bundle():
    """Train a small BITS-mode fatchord WaveRNN to reproduce a sine whose
    period divides the hop — a trivially predictable AR target."""
    from rtvc_tpu.models.wavernn import VOC_FATCHORD, WaveRNNDims, init_wavernn

    d = WaveRNNDims(
        variant=VOC_FATCHORD, mode="BITS", rnn_dims=32, fc_dims=32,
        bits=BITS, pad=2, upsample_factors=(2, 2, 5), feat_dims=10,
        compute_dims=12, res_out_dims=16, res_blocks=1, hop_length=HOP,
        sample_rate=1000,
    )
    variables0 = init_wavernn(jax.random.PRNGKey(0), d)

    # Sine whose period does NOT divide the hop, so frames carry distinct
    # phases — and PHASE-INFORMATIVE conditioning (strided waveform samples
    # per frame, like real mels encode the signal): fold windows can then
    # lock onto the absolute phase during their overlap warmup, which is
    # exactly how batched generation works with real mels.
    period = 13.0
    frames = 40
    pad_samples = d.pad * HOP

    def make_wave(n, start=0):
        t = np.arange(start, start + n)
        return (0.6 * np.sin(2 * np.pi * t / period)).astype(np.float32)

    def make_cond(n_frames):
        """(feat_dims, n_frames + 2·pad) conditioning: strided samples of
        the waveform within each (padded) frame."""
        cond = np.zeros((d.feat_dims, n_frames + 2 * d.pad), np.float32)
        offs = (np.arange(d.feat_dims) * HOP) // d.feat_dims
        for f in range(n_frames + 2 * d.pad):
            start = f * HOP - pad_samples
            cond[:, f] = make_wave(HOP, start=start)[offs % HOP][: d.feat_dims]
        return cond

    T = frames * HOP  # training sequence
    wave = make_wave(T + 1)
    labels = np.asarray(float_2_label(jnp.asarray(wave), BITS)).astype(np.int32)
    x = np.asarray(label_2_float(jnp.asarray(labels[:-1].astype(np.float32)),
                                 BITS))
    y = labels[1:]

    mel = make_cond(frames)
    batch = {
        "x": jnp.asarray(x[None]),
        "y": jnp.asarray(y[None]),
        "y_float": jnp.asarray(wave[1:][None]),
        "mels": jnp.asarray(mel[None]),
    }

    optimizer = optax.adam(4e-3)
    step = make_wavernn_train_step(d, optimizer)
    params, stats = variables0["params"], variables0["batch_stats"]
    opt_state = optimizer.init(params)
    loss = None
    for _ in range(350):
        params, stats, opt_state, out = step(params, stats, opt_state, batch)
        loss = float(out["loss"])
    assert loss is not None and loss < 0.15, f"did not overfit: loss={loss}"
    variables = {"params": params, "batch_stats": stats}

    # long conditioning for generation, phase-consistent with absolute time
    gen_frames = 130  # ≈ 2600 samples → several folds at the small windows
    gen_mel = make_cond(gen_frames)[:, d.pad: gen_frames + d.pad]
    return variables, d, gen_mel


@pytest.fixture(scope="module")
def overfit():
    return _make_overfit_bundle()


def test_batched_decode_preserves_audio_across_window_configs(overfit):
    variables, d, gen_mel = overfit
    # production windows scale by hop ratio (prod hop 200 → test hop 20):
    # (6000,1000) → (600,100); (3000,1500) → (300,150); (1000,400) → (100,40)
    configs = [(600, 100), (300, 150), (100, 40)]
    rows = fold_fidelity(variables, d, gen_mel, configs)
    for row in rows:
        # phase-aligned residual small (faithful signal in every fold) and
        # no clicks at the joins (crossfades as smooth as the interior)
        assert row["aligned_rms"] < 0.10, row
        assert row["join_click_ratio"] < 1.05, row
    big, small = rows[0], rows[-1]
    assert small["num_folds"] > big["num_folds"]  # the sweep is real


def test_fidelity_metric_flags_broken_crossfade(overfit):
    """Sanity of the metric itself: a near-zero overlap (4 samples — almost
    no warmup or crossfade) must register elevated join discontinuity."""
    variables, d, gen_mel = overfit
    rows = fold_fidelity(variables, d, gen_mel, [(100, 40), (136, 4)])
    good, bad = rows
    assert bad["join_click_ratio"] > 1.1, rows
    assert bad["join_click_ratio"] > good["join_click_ratio"] + 0.1, rows


def test_mcd_scale_is_interpretable():
    """The MCD instrument's dB scale must be meaningful on real speech:
    a Griffin-Lim reconstruction of an utterance's own mel lands in the
    interpretable <15 dB range (published GL MCDs sit ~7-9), the 8-bit
    mu-law roundtrip (the RAW vocoder's quantization ceiling) under 2 dB,
    and white noise far above both. Anchors bench_quality.py's
    gl_vocoded_mcd metric (round-3 verdict: 'real MCDs live under
    ~15 dB')."""
    import jax

    from rtvc_tpu.config import preprocessing, sp
    from rtvc_tpu.ops.audio import (
        decode_mu_law,
        encode_mu_law,
        inv_mel_spectrogram,
        melspectrogram,
    )
    from rtvc_tpu.utils import mpeg
    from rtvc_tpu.utils.genquality import mel_cepstral_distortion
    from rtvc_tpu.utils.io import load_wav, sample_path

    if not mpeg.mpeg_supported():
        pytest.skip("no mp3 decode for the real-speech fixture")
    wav, _ = load_wav(sample_path("p240_00000.mp3"), target_sr=sp.sample_rate)
    wav = (wav / max(abs(wav).max(), 1e-9) * 0.8).astype(np.float32)
    wav = wav[: 2 * sp.sample_rate]
    pp = preprocessing.replace(griffin_lim_iters=8)  # CPU speed
    mel = melspectrogram(wav, sp, pp)
    gl = np.asarray(inv_mel_spectrogram(mel, sp, pp, jax.random.PRNGKey(0),
                                        length=len(wav)))
    mcd_gl = mel_cepstral_distortion(wav, gl, sp, pp)
    q = np.asarray(decode_mu_law(encode_mu_law(wav, 256), 256,
                                 from_labels=True), np.float32)
    mcd_q = mel_cepstral_distortion(wav, q, sp, pp)
    noise = np.random.default_rng(0).standard_normal(len(wav)).astype(
        np.float32) * 0.3
    mcd_noise = mel_cepstral_distortion(wav, noise, sp, pp)
    assert mcd_gl < 15.0, f"GL MCD {mcd_gl:.1f} dB not interpretable"
    assert mcd_q < 2.0, f"mu-law ceiling {mcd_q:.2f} dB"
    assert mcd_noise > 4 * mcd_gl


def test_quality_gate_delta_math():
    """bench_quality's self-gate: relative thresholds on healthy baselines,
    but a near-zero baseline (tiny-budget clone_embed_cosine ≈ 0.03) must
    not turn run-to-run embedding noise into a fail — the worsening
    fraction is taken against max(|prev|, scale_floor)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench_quality", Path(__file__).parent.parent / "bench_quality.py")
    bq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bq)

    def row(metric, value):
        return {"metric": metric, "value": value, "corpus": "c",
                "platform": "cpu"}

    # near-zero cosine baseline: a 0.01 absolute wobble is noise, not fail
    st = bq._delta_status("clone_embed_cosine", 0.017,
                          row("clone_embed_cosine", 0.027), "c", "cpu")
    assert st["status"] in ("pass", "warn"), st
    # a genuine collapse on a healthy baseline still fails
    st = bq._delta_status("clone_embed_cosine", 0.40,
                          row("clone_embed_cosine", 0.63), "c", "cpu")
    assert st["status"] == "fail", st
    # MCD: small drift warns at most, a >10 % regression fails
    st = bq._delta_status("gta_vocoded_mcd", 37.0,
                          row("gta_vocoded_mcd", 36.6), "c", "cpu")
    assert st["status"] in ("pass", "warn"), st
    st = bq._delta_status("gta_vocoded_mcd", 42.0,
                          row("gta_vocoded_mcd", 36.6), "c", "cpu")
    assert st["status"] == "fail", st
    # cross-corpus / cross-platform rows never gate
    st = bq._delta_status("gta_vocoded_mcd", 99.0,
                          row("gta_vocoded_mcd", 36.6), "other", "cpu")
    assert st["status"] == "no_baseline", st
    st = bq._delta_status("gta_vocoded_mcd", 99.0,
                          row("gta_vocoded_mcd", 36.6), "c", "tpu")
    assert st["status"] == "no_baseline", st
    # a legacy row with NO platform tag was measured on an unknown backend
    # and must not gate either (it must not default to the current one)
    untagged = {"metric": "gta_vocoded_mcd", "value": 36.6, "corpus": "c"}
    st = bq._delta_status("gta_vocoded_mcd", 99.0, untagged, "c", "cpu")
    assert st["status"] == "no_baseline", st
    # improvements always pass
    st = bq._delta_status("gl_vocoded_mcd", 8.0,
                          row("gl_vocoded_mcd", 9.2), "c", "cpu")
    assert st["status"] == "pass", st
