"""Learning tests: each training step actually optimizes its model — loss
drops substantially when overfitting a single batch (stronger than
finite-loss smoke tests; catches broken gradients/optimizer wiring)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from rtvc_tpu.config.synthesizer import ForwardTacotronParams, TacotronParams
from rtvc_tpu.config.vocoder import WaveRNNParams
from rtvc_tpu.models import factories
from rtvc_tpu.train.trainer import make_optimizer, set_lr

pytestmark = pytest.mark.slow  # excluded from the quick gate (make test)


def _overfit(step_fn, params, stats, opt_state, batch, rng, n=40):
    losses = []
    for i in range(n):
        out = step_fn(params, stats, opt_state, batch, jax.random.fold_in(rng, i))
        params, stats, opt_state = out[0], out[1], out[2]
        losses.append(float(out[3]["loss"]))
    return losses


class TestTacotronLearns:
    def test_single_batch_overfit(self):
        cfg = TacotronParams(
            embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
            encoder_K=2, lstm_dims=16, postnet_K=2, num_highways=2,
        )
        bundle = factories.init_syn_model(
            factories.MODEL_TYPE_TACOTRON, override_hp=cfg
        )
        from rtvc_tpu.train.steps import make_tacotron_train_step

        optimizer = optax.adam(3e-3)
        step = make_tacotron_train_step(bundle.dims, optimizer, r=2)
        rng = np.random.default_rng(0)
        B, T, F = 2, 8, 8
        batch = {
            "chars": jnp.asarray(rng.integers(1, 20, (B, T)), jnp.int32),
            "mels": jnp.asarray(rng.uniform(-4, 4, (B, 80, F)), jnp.float32),
            "embeds": jnp.asarray(rng.standard_normal((B, 768)), jnp.float32),
            "stop": jnp.ones((B, F), jnp.float32),
        }
        losses = _overfit(
            step, bundle.variables["params"], bundle.variables["batch_stats"],
            optimizer.init(bundle.variables["params"]), batch,
            jax.random.PRNGKey(0),
        )
        # random targets: assert a solid optimization trend
        assert losses[-1] < 0.8 * losses[0], losses[::8]
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestWaveRNNLearns:
    def test_single_batch_overfit(self):
        cfg = WaveRNNParams(
            rnn_dims=24, fc_dims=24, compute_dims=12, res_out_dims=16,
            res_blocks=1, bits=6, seq_len=400,
        )
        bundle = factories.init_voc_model(
            factories.MODEL_TYPE_FATCHORD, override_hp=cfg
        )
        from rtvc_tpu.train.steps import make_wavernn_train_step

        optimizer = optax.adam(3e-3)
        step = make_wavernn_train_step(bundle.dims, optimizer)
        rng = np.random.default_rng(0)
        B, seq = 2, 400
        mel_win = seq // 200 + 2 * cfg.pad
        batch = {
            "x": jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32),
            "y": jnp.asarray(rng.integers(0, 2**6, (B, seq)), jnp.int32),
            "y_float": jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32),
            "mels": jnp.asarray(rng.uniform(-1, 1, (B, 80, mel_win)), jnp.float32),
        }
        losses = []
        params, stats = bundle.variables["params"], bundle.variables["batch_stats"]
        opt_state = optimizer.init(params)
        for _ in range(40):
            params, stats, opt_state, out = step(params, stats, opt_state, batch)
            losses.append(float(out["loss"]))
        # CE over random labels sits near the entropy floor; assert the
        # optimizer still makes steady progress toward it
        assert losses[-1] < 0.97 * losses[0], losses[::8]
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestForwardTacotronLearns:
    def test_single_batch_overfit(self):
        cfg = ForwardTacotronParams(
            embed_dims=16, series_embed_dims=8,
            duration_conv_dims=12, duration_rnn_dims=8,
            pitch_conv_dims=12, pitch_rnn_dims=8,
            energy_conv_dims=12, energy_rnn_dims=8,
            prenet_dims=16, prenet_k=2, prenet_num_highways=1,
            rnn_dims=16, postnet_dims=12, postnet_k=2, postnet_num_highways=1,
        )
        bundle = factories.init_syn_model(
            factories.MODEL_TYPE_FORWARD_TACOTRON, override_hp=cfg
        )
        from rtvc_tpu.train.steps import make_nar_synth_train_step

        optimizer = optax.adam(3e-3)
        step = make_nar_synth_train_step(
            factories.MODEL_TYPE_FORWARD_TACOTRON, bundle.dims, optimizer, cfg
        )
        rng = np.random.default_rng(0)
        B, T = 2, 6
        dur = np.full((B, T), 2.0, np.float32)
        L = int(dur[0].sum())
        batch = {
            "chars": jnp.asarray(rng.integers(1, 20, (B, T)), jnp.int32),
            "mels": jnp.asarray(rng.uniform(-4, 4, (B, 80, L)), jnp.float32),
            "embeds": jnp.asarray(rng.standard_normal((B, 768)), jnp.float32),
            "durations": jnp.asarray(dur),
            "spec_lens": jnp.asarray([L, L]),
            "x_lens": jnp.asarray([T, T]),
            "pitch": jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
            "energy": jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
        }
        losses = []
        params, stats = bundle.variables["params"], bundle.variables["batch_stats"]
        opt_state = optimizer.init(params)
        for i in range(40):
            params, stats, opt_state, out = step(
                params, stats, opt_state, batch, jax.random.fold_in(jax.random.PRNGKey(0), i)
            )
            losses.append(float(out["loss"]))
        assert losses[-1] < 0.95 * losses[0], losses[::8]
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestMixedPrecisionLearns:
    """The bf16 compute policy (rtvc_tpu/ops/precision.py): master params
    stay f32, the forward/backward streams run bf16. Gate: the first-step
    loss matches f32 closely (same math, rounded activations) and the
    optimizer still overfits a single batch."""

    def test_tacotron_bf16_matches_and_learns(self):
        cfg = TacotronParams(
            embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
            encoder_K=2, lstm_dims=16, postnet_K=2, num_highways=2,
        )
        bundle = factories.init_syn_model(
            factories.MODEL_TYPE_TACOTRON, override_hp=cfg
        )
        from rtvc_tpu.train.steps import make_tacotron_train_step

        optimizer = optax.adam(3e-3)
        rng = np.random.default_rng(0)
        B, T, F = 2, 8, 8
        batch = {
            "chars": jnp.asarray(rng.integers(1, 20, (B, T)), jnp.int32),
            "mels": jnp.asarray(rng.uniform(-4, 4, (B, 80, F)), jnp.float32),
            "embeds": jnp.asarray(rng.standard_normal((B, 768)), jnp.float32),
            "stop": jnp.ones((B, F), jnp.float32),
        }
        first = {}
        for dt in (jnp.float32, jnp.bfloat16):
            step = make_tacotron_train_step(
                bundle.dims, optimizer, r=2, compute_dtype=dt
            )
            losses = _overfit(
                step,
                jax.tree_util.tree_map(jnp.copy, bundle.variables["params"]),
                jax.tree_util.tree_map(jnp.copy,
                                       bundle.variables["batch_stats"]),
                optimizer.init(bundle.variables["params"]), batch,
                jax.random.PRNGKey(0),
            )
            first[dt] = losses[0]
            assert np.isfinite(losses).all()
            assert losses[-1] < 0.85 * losses[0], (dt, losses[::8])
        # same initial params + same batch → first losses agree to bf16
        # rounding (relative; these losses are O(10))
        rel = abs(first[jnp.bfloat16] - first[jnp.float32]) / first[jnp.float32]
        assert rel < 0.05, first

    def test_wavernn_bf16_matches_and_learns(self):
        cfg = WaveRNNParams(
            rnn_dims=24, fc_dims=24, compute_dims=12, res_out_dims=16,
            res_blocks=1, bits=6, seq_len=400,
        )
        bundle = factories.init_voc_model(
            factories.MODEL_TYPE_FATCHORD, override_hp=cfg
        )
        from rtvc_tpu.train.steps import make_wavernn_train_step

        optimizer = optax.adam(3e-3)
        rng = np.random.default_rng(0)
        B, seq = 2, 400
        mel_win = seq // 200 + 2 * cfg.pad
        batch = {
            "x": jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32),
            "y": jnp.asarray(rng.integers(0, 2**6, (B, seq)), jnp.int32),
            "y_float": jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32),
            "mels": jnp.asarray(
                rng.uniform(-1, 1, (B, 80, mel_win)), jnp.float32),
        }
        first = {}
        for dt in (jnp.float32, jnp.bfloat16):
            step = make_wavernn_train_step(bundle.dims, optimizer,
                                           compute_dtype=dt)
            params = jax.tree_util.tree_map(jnp.copy,
                                            bundle.variables["params"])
            stats = jax.tree_util.tree_map(jnp.copy,
                                           bundle.variables["batch_stats"])
            opt_state = optimizer.init(params)
            losses = []
            for _ in range(40):
                params, stats, opt_state, out = step(
                    params, stats, opt_state, batch
                )
                losses.append(float(out["loss"]))
            first[dt] = losses[0]
            assert np.isfinite(losses).all()
            assert losses[-1] < 0.97 * losses[0], (dt, losses[::8])
            # master params and BN stats stay f32
            for leaf in jax.tree_util.tree_leaves((params, stats)):
                if jnp.issubdtype(leaf.dtype, jnp.inexact):
                    assert leaf.dtype == jnp.float32
        rel = abs(first[jnp.bfloat16] - first[jnp.float32]) / first[jnp.float32]
        assert rel < 0.05, first

    def test_encoder_bf16_matches_and_learns(self):
        from rtvc_tpu.config.encoder import (
            EncoderDataParams,
            EncoderModelParams,
        )
        from rtvc_tpu.models.speaker_encoder import (
            SpeakerEncoder,
            init_similarity_params,
        )
        from rtvc_tpu.train.steps import make_encoder_train_step

        model = SpeakerEncoder(
            model=EncoderModelParams(model_hidden_size=16,
                                     model_embedding_size=16,
                                     model_num_layers=2),
            data=EncoderDataParams(),
        )
        S, U, T, n_mels = 6, 4, 20, 10
        rng = np.random.default_rng(3)
        # separable data: per-speaker mean offsets
        base = rng.standard_normal((S, 1, 1, n_mels)) * 2.0
        batch = (base + rng.standard_normal((S, U, T, n_mels))).reshape(
            S * U, T, n_mels
        ).astype(np.float32)
        batch = jnp.asarray(batch)
        params = {
            "model": model.init(jax.random.PRNGKey(0), batch)["params"],
            "similarity": init_similarity_params(),
        }
        optimizer = optax.adam(1e-2)
        first = {}
        for dt in (jnp.float32, jnp.bfloat16):
            step = make_encoder_train_step(model, optimizer, S, U,
                                           compute_dtype=dt)
            p = jax.tree_util.tree_map(jnp.copy, params)
            o = optimizer.init(p)
            losses = []
            for _ in range(30):
                p, o, st, _, _ = step(p, o, batch)
                losses.append(float(st["loss"]))
            first[dt] = losses[0]
            assert np.isfinite(losses).all()
            assert losses[-1] < 0.5 * losses[0], (dt, losses[::6])
        rel = abs(first[jnp.bfloat16] - first[jnp.float32]) / first[jnp.float32]
        assert rel < 0.05, first



    def test_nar_synths_bf16_match_and_learn(self):
        """ForwardTacotron AND FastPitch under the bf16 policy — FastPitch
        caught a real bug here: the f32 positional-encoding table promoted
        the stream back to f32 and crashed the FFT-block convs on dtype
        mismatch (fast_pitch.py:forward_transformer)."""
        from rtvc_tpu.config.synthesizer import FastPitchParams
        from rtvc_tpu.train.steps import make_nar_synth_train_step

        fp_cfg = FastPitchParams(
            embed_dims=16, n_heads=2, conv_kernel=3, conv_dims=32,
            n_layers_enc=2, n_layers_dec=2,
            series_d_model=8, series_n_heads=1, series_layers=1,
            series_d_fft=16,
        )
        ft_cfg = ForwardTacotronParams(
            embed_dims=16, series_embed_dims=8,
            duration_conv_dims=12, duration_rnn_dims=8,
            pitch_conv_dims=12, pitch_rnn_dims=8,
            energy_conv_dims=12, energy_rnn_dims=8,
            prenet_dims=16, prenet_k=2, prenet_num_highways=1,
            rnn_dims=16, postnet_dims=12, postnet_k=2,
            postnet_num_highways=1,
        )
        cases = [
            (factories.MODEL_TYPE_FORWARD_TACOTRON, ft_cfg),
            (factories.MODEL_TYPE_FASTPITCH, fp_cfg),
        ]
        rng = np.random.default_rng(0)
        B, T = 2, 6
        dur = np.full((B, T), 2.0, np.float32)
        L = int(dur[0].sum())
        batch = {
            "chars": jnp.asarray(rng.integers(1, 20, (B, T)), jnp.int32),
            "mels": jnp.asarray(rng.uniform(-4, 4, (B, 80, L)), jnp.float32),
            "embeds": jnp.asarray(rng.standard_normal((B, 768)), jnp.float32),
            "durations": jnp.asarray(dur),
            "spec_lens": jnp.asarray([L, L]),
            "x_lens": jnp.asarray([T, T]),
            "pitch": jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
            "energy": jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
        }
        optimizer = optax.adam(3e-3)
        for model_type, cfg in cases:
            bundle = factories.init_syn_model(model_type, override_hp=cfg)
            first = {}
            for dt in (jnp.float32, jnp.bfloat16):
                step = make_nar_synth_train_step(
                    model_type, bundle.dims, optimizer, cfg,
                    compute_dtype=dt)
                params = jax.tree_util.tree_map(
                    jnp.copy, bundle.variables["params"])
                stats = jax.tree_util.tree_map(
                    jnp.copy, bundle.variables["batch_stats"])
                opt_state = optimizer.init(params)
                losses = []
                for i in range(30):
                    params, stats, opt_state, out = step(
                        params, stats, opt_state, batch,
                        jax.random.fold_in(jax.random.PRNGKey(0), i))
                    losses.append(float(out["loss"]))
                first[dt] = losses[0]
                assert np.isfinite(losses).all(), model_type
                assert losses[-1] < 0.97 * losses[0], (model_type, dt,
                                                       losses[::6])
                for leaf in jax.tree_util.tree_leaves((params, stats)):
                    if jnp.issubdtype(leaf.dtype, jnp.inexact):
                        assert leaf.dtype == jnp.float32
            rel = abs(first[jnp.bfloat16] - first[jnp.float32]) / abs(
                first[jnp.float32])
            assert rel < 0.05, (model_type, first)


class TestAutoPolicy:
    def test_resolve_auto_matches_backend(self):
        """'auto' (the train-CLI default) = bf16 on TPU, f32 elsewhere."""
        import jax
        import jax.numpy as jnp

        from rtvc_tpu.ops import precision

        dt = precision.resolve("auto")
        expected = (jnp.bfloat16 if jax.default_backend() == "tpu"
                    else jnp.float32)
        assert dt == expected
        assert precision.resolve("bf16") == jnp.bfloat16
        assert precision.resolve(None) == jnp.float32
