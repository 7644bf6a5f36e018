"""Pallas kernel tests (interpret mode on the CPU platform; the same code
compiles with Mosaic on real TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtvc_tpu.config import preprocessing, sp
from rtvc_tpu.ops.audio import melspectrogram
from rtvc_tpu.ops.pallas.mel_kernel import melspectrogram_pallas


class TestMelKernel:
    def test_matches_reference_path(self):
        rng = np.random.default_rng(0)
        t = np.arange(16000) / 16000
        wav = jnp.asarray(
            (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        )
        expected = np.asarray(melspectrogram(wav, sp, preprocessing))
        got = np.asarray(melspectrogram_pallas(wav, sp, preprocessing,
                                               interpret=True))
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=2e-4)

    def test_odd_frame_count(self):
        wav = jnp.asarray(np.random.default_rng(1).standard_normal(4321),
                          jnp.float32)
        got = np.asarray(melspectrogram_pallas(wav, sp, preprocessing,
                                               interpret=True))
        expected = np.asarray(melspectrogram(wav, sp, preprocessing))
        np.testing.assert_allclose(got, expected, atol=2e-4)


class TestWaveRNNKernel:
    def _dims(self, variant, mode="RAW"):
        from rtvc_tpu.models.wavernn import WaveRNNDims

        return WaveRNNDims(
            variant=variant, mode=mode, rnn_dims=16, fc_dims=16, bits=6,
            pad=2, upsample_factors=(2, 2, 5), feat_dims=10, compute_dims=8,
            res_out_dims=16, res_blocks=1, hop_length=20, sample_rate=1000,
        )

    def _parity(self, variant, mode):
        from rtvc_tpu.models.wavernn import (
            generate_core,
            init_wavernn,
            upsample_forward,
        )
        from rtvc_tpu.ops.pallas.wavernn_kernel import generate_core_pallas

        d = self._dims(variant, mode)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.uniform(-1, 1, (2, d.feat_dims, 12)), jnp.float32)
        mels = jnp.pad(mel, ((0, 0), (0, 0), (d.pad, d.pad)))
        mu, aux, _ = upsample_forward(
            variables["params"]["upsample"],
            variables["batch_stats"]["upsample"], d, mels, train=False,
        )
        expected = np.asarray(
            generate_core(variables, d, mu, aux, jax.random.PRNGKey(1),
                          argmax=True)
        )
        got = np.asarray(
            generate_core_pallas(variables, d, mu, aux, jax.random.PRNGKey(1),
                                 argmax=True, interpret=True)
        )
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_runtimeracer_matches_xla(self):
        self._parity("runtimeracer-wavernn", "RAW")

    def test_fatchord_matches_xla(self):
        self._parity("fatchord-wavernn", "RAW")

    def test_geneing_bits_matches_xla(self):
        self._parity("geneing-wavernn", "BITS")

    def test_fatchord_mol_matches_xla(self):
        # MOL argmax = pick the most-likely component, emit its clipped mean —
        # deterministic, so XLA and Pallas must agree exactly.
        self._parity("fatchord-wavernn", "MOL")

    def test_runtimeracer_mol_matches_xla(self):
        self._parity("runtimeracer-wavernn", "MOL")

    def test_bf16_streams_preserve_greedy_decode(self):
        """The production default streams conditioning in bf16 (f32 compute/
        state); greedy decodes must stay in near-total agreement with the
        f32-stream decode — a large drift would mean the rounding is
        changing audio, not just perf."""
        from rtvc_tpu.models.wavernn import init_wavernn, upsample_forward
        from rtvc_tpu.ops.pallas.wavernn_kernel import generate_core_pallas

        d = self._dims("runtimeracer-wavernn", "RAW")
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        rng = np.random.default_rng(5)
        mel = jnp.asarray(rng.uniform(-1, 1, (2, d.feat_dims, 12)), jnp.float32)
        mels = jnp.pad(mel, ((0, 0), (0, 0), (d.pad, d.pad)))
        mu, aux, _ = upsample_forward(
            variables["params"]["upsample"],
            variables["batch_stats"]["upsample"], d, mels, train=False,
        )
        a = np.asarray(generate_core_pallas(
            variables, d, mu, aux, jax.random.PRNGKey(1), argmax=True,
            interpret=True,
        ))
        b = np.asarray(generate_core_pallas(
            variables, d, mu, aux, jax.random.PRNGKey(1), argmax=True,
            interpret=True, stream_dtype=jnp.bfloat16,
        ))
        agree = float((a == b).mean())
        assert agree > 0.97, agree

    def test_geneing_beta_argmax_matches_xla(self):
        """geneing RAW (2-parameter beta head, round 2 in-kernel): greedy
        decode = distribution mode, must match the XLA path."""
        self._parity("geneing-wavernn", "RAW")

    def test_geneing_beta_stochastic_sampling_in_range(self):
        # pltpu.prng_* has no CPU-interpret lowering — TPU hardware only.
        if jax.devices()[0].platform != "tpu":
            pytest.skip("pltpu.prng_seed requires real TPU hardware")
        from rtvc_tpu.models.wavernn import init_wavernn, upsample_forward
        from rtvc_tpu.ops.pallas.wavernn_kernel import generate_core_pallas

        d = self._dims("geneing-wavernn", "RAW")
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        rng = np.random.default_rng(2)
        mel = jnp.asarray(rng.uniform(-1, 1, (2, d.feat_dims, 12)), jnp.float32)
        mels = jnp.pad(mel, ((0, 0), (0, 0), (d.pad, d.pad)))
        mu, aux, _ = upsample_forward(
            variables["params"]["upsample"],
            variables["batch_stats"]["upsample"], d, mels, train=False,
        )
        got = np.asarray(
            generate_core_pallas(variables, d, mu, aux, jax.random.PRNGKey(3))
        )
        assert got.shape == (2, mu.shape[1])
        assert np.isfinite(got).all()
        assert (got >= -1.0).all() and (got <= 1.0).all()
        assert got.std() > 1e-4  # beta draws actually vary

    def test_marsaglia_tsang_math_matches_scipy_beta(self):
        """Distribution-correctness of the in-kernel beta sampler: the exact
        arithmetic (Box-Muller → squeeze → ×2 accept → α<1 boost →
        Gα/(Gα+Gβ)) mirrored in numpy must match scipy's Beta across
        parameter regimes (mean/var + KS)."""
        from scipy import stats

        def gamma_mt(a, U):  # U: (n, 7) uniforms — same formula as the kernel
            ab = np.where(a < 1.0, a + 1.0, a)
            d_ = ab - 1.0 / 3.0
            c_ = 1.0 / np.sqrt(9.0 * d_)

            def one(u1, u2, uacc):
                x = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
                v = (1.0 + c_ * x) ** 3
                ok = (v > 0.0) & (
                    np.log(uacc)
                    < 0.5 * x * x + d_ - d_ * v + d_ * np.log(np.maximum(v, 1e-30))
                )
                return ok, d_ * v

            ok1, g1 = one(U[:, 0], U[:, 1], U[:, 2])
            ok2, g2 = one(U[:, 3], U[:, 4], U[:, 5])
            g = np.where(ok1, g1, np.where(ok2, g2, d_))
            g = np.maximum(g, 1e-12)
            return np.where(a < 1.0, g * U[:, 6] ** (1.0 / a), g)

        rng = np.random.default_rng(0)
        n = 40000
        for alpha, beta in ((2.0, 5.0), (0.5, 0.5), (4.0, 1.5), (0.7, 3.0)):
            a = np.full(n, alpha)
            b = np.full(n, beta)
            ga = gamma_mt(a, rng.uniform(1e-7, 1 - 1e-7, (n, 7)))
            gb = gamma_mt(b, rng.uniform(1e-7, 1 - 1e-7, (n, 7)))
            x = ga / (ga + gb)
            ref = stats.beta(alpha, beta)
            assert abs(x.mean() - ref.mean()) < 0.01, (alpha, beta, x.mean())
            assert abs(x.var() - ref.var()) < 0.01, (alpha, beta, x.var())
            ks = stats.kstest(x, ref.cdf).statistic
            assert ks < 0.02, (alpha, beta, ks)

    def test_geneing_mol_matches_xla(self):
        self._parity("geneing-wavernn", "MOL")

    @pytest.mark.slow
    def test_tacotron_decoder_matches_xla(self):
        """Interpret-mode parity of the fused decoder against a manual
        decoder_step loop (dropout off → deterministic). Also checks the
        early-stop rule (kernel stops exactly where the while_loop would)."""
        from rtvc_tpu.models.tacotron import (
            TacotronDims,
            decoder_step,
            encode,
            init_decoder_carry,
            init_tacotron,
        )
        from rtvc_tpu.ops.pallas.tacotron_kernel import decode_pallas

        d = TacotronDims(
            num_chars=40, n_mels=16, fft_bins=16, speaker_embedding_size=24,
            embed_dims=16, encoder_dims=8, decoder_dims=16, postnet_dims=8,
            encoder_K=2, postnet_K=2, num_highways=2, lstm_dims=16,
            max_r=4, dropout=0.5, stop_threshold=-3.4,
        )
        variables = init_tacotron(jax.random.PRNGKey(0), d)
        rng = np.random.default_rng(0)
        chars = jnp.asarray(
            np.where(np.arange(16)[None, :] < 12,
                     rng.integers(1, 40, (2, 16)), 0), jnp.int32
        )
        spk = jnp.asarray(rng.standard_normal((2, 24)), jnp.float32)
        r = 2
        k_enc, k_dec = jax.random.split(jax.random.PRNGKey(3))
        enc_seq, enc_proj, _ = encode(variables, d, chars, spk,
                                      train=False, rng=k_enc)
        mask = (chars != 0).astype(jnp.float32)

        carry = init_decoder_carry(d, 2, 16)
        prev = jnp.zeros((2, d.n_mels))
        refs = []
        done_at = None
        for i in range(12):
            carry, m, sc, st = decoder_step(
                variables["params"], d, r, carry, prev, enc_seq, enc_proj,
                mask, jax.random.fold_in(k_dec, i), False,
                prenet_dropout=False,
            )
            refs.append((np.asarray(m), np.asarray(sc)))
            prev = m[:, :, -1]
            if done_at is None and bool(jnp.all(st > 0.5)) and i * r > 10:
                done_at = i

        mel_p, attn_p, stops_p = decode_pallas(
            variables, d, enc_seq, enc_proj, mask, k_dec, r=r, max_steps=24,
            dropout=False, interpret=True,
        )
        mel_p, attn_p = np.asarray(mel_p), np.asarray(attn_p)
        active = done_at + 1 if done_at is not None else 12
        for i in range(active):
            m, sc = refs[i]
            np.testing.assert_allclose(mel_p[:, :, i*r:(i+1)*r], m, atol=1e-5)
            np.testing.assert_allclose(attn_p[:, i], sc, atol=1e-6)
        if done_at is not None:  # kernel zeroed everything past the stop
            assert np.abs(mel_p[:, :, active*r:]).max() == 0.0

    def test_mol_stochastic_sampling_in_range(self):
        # pltpu.prng_* has no CPU-interpret lowering — TPU hardware only.
        import pytest

        if jax.devices()[0].platform != "tpu":
            pytest.skip("pltpu.prng_seed requires real TPU hardware")
        from rtvc_tpu.models.wavernn import init_wavernn, upsample_forward
        from rtvc_tpu.ops.pallas.wavernn_kernel import generate_core_pallas

        d = self._dims("fatchord-wavernn", "MOL")
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        rng = np.random.default_rng(2)
        mel = jnp.asarray(rng.uniform(-1, 1, (2, d.feat_dims, 12)), jnp.float32)
        mels = jnp.pad(mel, ((0, 0), (0, 0), (d.pad, d.pad)))
        mu, aux, _ = upsample_forward(
            variables["params"]["upsample"],
            variables["batch_stats"]["upsample"], d, mels, train=False,
        )
        got = np.asarray(
            generate_core_pallas(variables, d, mu, aux, jax.random.PRNGKey(3))
        )
        assert got.shape == (2, mu.shape[1])
        assert np.isfinite(got).all()
        assert (got >= -1.0).all() and (got <= 1.0).all()
        # logistic-noise draws must actually perturb the samples
        assert got.std() > 1e-4


class TestGRUTrainKernel:
    """Fused train-time GRU (forward + custom VJP) vs the lax.scan path."""

    def _ref(self, w_hh_t, b_hh, xg):
        from rtvc_tpu.models.layers import gru_step

        B, T, threeH = xg.shape
        H = threeH // 3

        def step(h, xg_t):
            h = gru_step(xg_t, h, w_hh_t, b_hh)
            return h, h

        _, ys = jax.lax.scan(step, jnp.zeros((B, H), xg.dtype),
                             jnp.swapaxes(xg, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    def _inputs(self, B=3, T=37, H=128, seed=0):
        rng = np.random.default_rng(seed)
        w_hh_t = jnp.asarray(
            rng.standard_normal((H, 3 * H)) / np.sqrt(H), jnp.float32)
        b_hh = jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32)
        xg = jnp.asarray(rng.standard_normal((B, T, 3 * H)), jnp.float32)
        return w_hh_t, b_hh, xg

    def test_forward_matches_scan(self):
        from rtvc_tpu.ops.pallas.gru_train_kernel import gru_seq_fused

        w, b, xg = self._inputs()
        got = np.asarray(gru_seq_fused(w, b, xg, True))
        want = np.asarray(self._ref(w, b, xg))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_gradients_match_scan_ad(self):
        from rtvc_tpu.ops.pallas.gru_train_kernel import gru_seq_fused

        w, b, xg = self._inputs(seed=1)
        # weight the loss so every (t, b, h) position carries a distinct
        # cotangent — a plain sum would hide transposition bugs
        key = jax.random.PRNGKey(7)
        wgt = jax.random.normal(key, (xg.shape[0], xg.shape[1], 128))

        def loss_fused(w_, b_, xg_):
            return jnp.sum(gru_seq_fused(w_, b_, xg_, True) * wgt)

        def loss_ref(w_, b_, xg_):
            return jnp.sum(self._ref(w_, b_, xg_) * wgt)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(w, b, xg)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(w, b, xg)
        for gf, gr, name in zip(g_fused, g_ref, ("w_hh_t", "b_hh", "xg")):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=5e-4,
                rtol=1e-4, err_msg=name)

    def test_unpadded_tile_boundary(self):
        """T an exact multiple of the tile and B of the sublane count."""
        from rtvc_tpu.ops.pallas.gru_train_kernel import gru_seq_fused

        w, b, xg = self._inputs(B=8, T=32, seed=2)
        got = np.asarray(gru_seq_fused(w, b, xg, True))
        want = np.asarray(self._ref(w, b, xg))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_wavernn_forward_integration(self, monkeypatch):
        """wavernn_forward routes its GRUs through the fused kernel when
        forced (H multiple of 128): loss + grads match the scan path."""
        from rtvc_tpu.models.wavernn import (
            VOC_FATCHORD,
            WaveRNNDims,
            init_wavernn,
            wavernn_forward,
        )

        d = WaveRNNDims(
            variant=VOC_FATCHORD, mode="RAW", rnn_dims=128, fc_dims=16,
            bits=6, pad=2, upsample_factors=(2, 2, 5), feat_dims=10,
            compute_dims=8, res_out_dims=16, res_blocks=1, hop_length=20,
            sample_rate=1000,
        )
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        rng = np.random.default_rng(3)
        n_frames = 2 + 2 * d.pad
        mels = jnp.asarray(rng.uniform(-1, 1, (2, d.feat_dims, n_frames)),
                           jnp.float32)
        T = 2 * d.hop_length
        x = jnp.asarray(rng.uniform(-1, 1, (2, T)), jnp.float32)

        def loss(params):
            out, _ = wavernn_forward(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                d, x, mels, train=True)
            return jnp.mean(out**2)

        monkeypatch.setenv("RTVC_FUSED_GRU_TRAIN", "0")
        l_scan, g_scan = jax.value_and_grad(loss)(variables["params"])
        monkeypatch.setenv("RTVC_FUSED_GRU_TRAIN", "1")
        l_fused, g_fused = jax.value_and_grad(loss)(variables["params"])

        np.testing.assert_allclose(float(l_fused), float(l_scan), rtol=1e-5)
        flat_s = jax.tree_util.tree_leaves(g_scan)
        flat_f = jax.tree_util.tree_leaves(g_fused)
        for a, b in zip(flat_f, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=1e-4)


class TestLSTMTrainKernel:
    """Fused train-time LSTM (forward + custom VJP) vs the lax.scan path."""

    def _ref(self, w_hh_t, xg, h0, c0):
        def step(carry, xg_t):
            h, c = carry
            gates = xg_t + jnp.dot(h, w_hh_t)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (hT, cT), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xg, 0, 1))
        return jnp.swapaxes(ys, 0, 1), hT, cT

    def _inputs(self, B=3, T=37, H=128, seed=0):
        rng = np.random.default_rng(seed)
        w = jnp.asarray(rng.standard_normal((H, 4 * H)) / np.sqrt(H),
                        jnp.float32)
        xg = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
        h0 = jnp.asarray(rng.standard_normal((B, H)) * 0.3, jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((B, H)) * 0.3, jnp.float32)
        return w, xg, h0, c0

    def test_forward_matches_scan(self):
        from rtvc_tpu.ops.pallas.lstm_train_kernel import lstm_seq_fused

        w, xg, h0, c0 = self._inputs()
        ys, hT, cT = lstm_seq_fused(w, xg, h0, c0, True)
        rys, rhT, rcT = self._ref(w, xg, h0, c0)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(rys),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(hT), np.asarray(rhT),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(cT), np.asarray(rcT),
                                   atol=1e-5)

    @pytest.mark.parametrize("T", [32, 37])  # exact tile and padded tail
    def test_gradients_match_scan_ad(self, T):
        from rtvc_tpu.ops.pallas.lstm_train_kernel import lstm_seq_fused

        w, xg, h0, c0 = self._inputs(T=T, seed=1)
        key = jax.random.PRNGKey(5)
        k1, k2 = jax.random.split(key)
        wgt = jax.random.normal(k1, (xg.shape[0], xg.shape[1], 128))
        wgt_h = jax.random.normal(k2, (xg.shape[0], 128))

        def loss_fused(w_, xg_, h0_, c0_):
            ys, hT, _ = lstm_seq_fused(w_, xg_, h0_, c0_, True)
            return jnp.sum(ys * wgt) + jnp.sum(hT * wgt_h)

        def loss_ref(w_, xg_, h0_, c0_):
            ys, hT, _ = self._ref(w_, xg_, h0_, c0_)
            return jnp.sum(ys * wgt) + jnp.sum(hT * wgt_h)

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(w, xg, h0, c0)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(w, xg, h0, c0)
        for a, b, name in zip(g_f, g_r, ("w_hh_t", "xg", "h0", "c0")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4, err_msg=name)

    def test_cT_cotangent_exact_tile(self):
        """c_T's cotangent path (only defined when T is tile-exact; the
        encoder never consumes c_T, but keep the exact case honest)."""
        from rtvc_tpu.ops.pallas.lstm_train_kernel import lstm_seq_fused

        w, xg, h0, c0 = self._inputs(T=32, seed=2)

        def loss_fused(c0_):
            _, _, cT = lstm_seq_fused(w, xg, h0, c0_, True)
            return jnp.sum(cT**2)

        def loss_ref(c0_):
            _, _, cT = self._ref(w, xg, h0, c0_)
            return jnp.sum(cT**2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_fused)(c0)),
            np.asarray(jax.grad(loss_ref)(c0)), atol=5e-4, rtol=1e-4)

    def test_speaker_encoder_integration(self, monkeypatch):
        """The encoder's 3-layer LSTM-256 routes through the fused kernel
        when forced: embeddings + grads match the scan path."""
        from rtvc_tpu.config.encoder import (
            EncoderDataParams,
            EncoderModelParams,
        )
        from rtvc_tpu.models.speaker_encoder import SpeakerEncoder

        model = SpeakerEncoder(
            model=EncoderModelParams(model_hidden_size=256,
                                     model_embedding_size=64,
                                     model_num_layers=2),
            data=EncoderDataParams(),
        )
        rng = np.random.default_rng(4)
        batch = jnp.asarray(
            rng.standard_normal((4, 24, 40)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), batch)["params"]

        def loss(p):
            return jnp.sum(model.apply({"params": p}, batch) ** 2)

        monkeypatch.setenv("RTVC_FUSED_LSTM_TRAIN", "0")
        l_scan, g_scan = jax.value_and_grad(loss)(params)
        monkeypatch.setenv("RTVC_FUSED_LSTM_TRAIN", "1")
        l_fused, g_fused = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(l_fused), float(l_scan),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                        jax.tree_util.tree_leaves(g_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-3)


class TestVmemAdaptiveTiles:
    """VMEM-budget tile selection (round 4): the encoder's production
    LSTM shape (B=640, H=768, f32) overflowed the ~128 MiB VMEM at the
    default (16, 128) tiles; _pick_tiles must shrink to fit, and the GRU
    kernel must refuse shapes it cannot tile (falling back to scan)."""

    def test_lstm_production_shape_shrinks(self):
        from rtvc_tpu.ops.pallas import lstm_train_kernel as lk

        S, Bt = lk._pick_tiles(640, 768, 4)
        assert (S, Bt) != (16, 128), "must shrink from the default"
        est = max(2 * S * Bt * 10 * 768 * 4,
                  2 * S * Bt * 768 * (20 + 24))
        assert est <= lk._VMEM_BUDGET

    def test_lstm_small_shape_keeps_default(self):
        from rtvc_tpu.ops.pallas import lstm_train_kernel as lk

        assert lk._pick_tiles(64, 256, 4) == (lk._tile_len(), 64)

    def test_gru_production_shape_keeps_tile32(self):
        """The measured-best WaveRNN config (B=40, H=512, tile 32) must
        survive the budget check — it is the headline train number."""
        from rtvc_tpu.ops.pallas import gru_train_kernel as gk

        assert gk._pick_tile_len(40, 512, 4) == 32
        assert gk.fused_fits(40, 512, jnp.float32)

    def test_gru_large_batch_shrinks_then_falls_back(self):
        """Sweep batches shrink the time tile (the kernel streams the full
        batch per window); truly huge batches exceed the budget even at
        the smallest tile and the dispatch must use lax.scan."""
        from rtvc_tpu.ops.pallas import gru_train_kernel as gk

        S320 = gk._pick_tile_len(320, 512, 4)
        assert S320 < 32
        assert gk._vmem_est(S320, 320, 512, 4) <= gk._VMEM_BUDGET
        assert gk.fused_fits(320, 512, jnp.float32)
        assert not gk.fused_fits(2048, 512, jnp.float32)


class TestBiLSTMFused:
    def test_bilstm_packed_fused_matches_scan(self, monkeypatch):
        """ForwardTacotron's packed BiLSTM (per-length reversed backward
        direction) routes through the fused LSTM kernel when forced:
        outputs + grads match the scan path, including the padded tail."""
        from rtvc_tpu.models.forward_tacotron import bilstm_packed

        rng = np.random.default_rng(7)
        B, T, I, H = 3, 12, 16, 128
        u = lambda *s: jnp.asarray(  # noqa: E731
            rng.standard_normal(s).astype(np.float32) * 0.2)
        p = {}
        for suffix in ("", "_reverse"):
            p[f"weight_ih_l0{suffix}"] = u(4 * H, I)
            p[f"weight_hh_l0{suffix}"] = u(4 * H, H)
            p[f"bias_ih_l0{suffix}"] = u(4 * H)
            p[f"bias_hh_l0{suffix}"] = u(4 * H)
        x = u(B, T, I)
        lens = jnp.asarray([12, 7, 3])

        def loss(p):
            return jnp.sum(bilstm_packed(p, x, lens, -4.0) ** 2)

        monkeypatch.setenv("RTVC_FUSED_LSTM_TRAIN", "0")
        y_scan = bilstm_packed(p, x, lens, -4.0)
        g_scan = jax.grad(loss)(p)
        monkeypatch.setenv("RTVC_FUSED_LSTM_TRAIN", "1")
        y_fused = bilstm_packed(p, x, lens, -4.0)
        g_fused = jax.grad(loss)(p)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_scan),
                                   atol=1e-5)
        for (k, a), b in zip(sorted(g_fused.items()),
                             [v for _, v in sorted(g_scan.items())]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4, err_msg=k)

    def test_odd_tile_override_falls_back_not_crashes(self, monkeypatch):
        """A non-power-of-two RTVC_GRU_TRAIN_TILE cannot be halved by the
        picker, so fused_fits must evaluate the ACTUAL pick and report
        unfittable shapes (dispatch then falls back to scan instead of
        launching an over-budget kernel)."""
        from rtvc_tpu.ops.pallas import gru_train_kernel as gk

        monkeypatch.setenv("RTVC_GRU_TRAIN_TILE", "31")
        assert gk._pick_tile_len(320, 512, 4) == 31
        assert not gk.fused_fits(320, 512, jnp.float32)
        assert not gk.fused_ok(320, 512, jnp.float32)
        # small batch still fits at 31
        assert gk.fused_fits(40, 512, jnp.float32)

    def test_cbhg_bigru_fused_matches_scan(self, monkeypatch):
        """The CBHG BiGRU (layers.GRU, no mask, zero init — the Tacotron
        encoder/postnet train path) routes through the fused GRU kernel
        when forced: outputs, h_T, and grads match the scan path."""
        from rtvc_tpu.models.layers import GRU

        B, T, I, H = 3, 10, 12, 128
        model = GRU(hidden_size=H, bidirectional=True)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p):
            ys, hT = model.apply({"params": p}, x)
            return jnp.sum(ys ** 2) + jnp.sum(hT ** 2)

        monkeypatch.setenv("RTVC_FUSED_GRU_TRAIN", "0")
        y_scan, h_scan = model.apply({"params": params}, x)
        g_scan = jax.grad(loss)(params)
        monkeypatch.setenv("RTVC_FUSED_GRU_TRAIN", "1")
        y_fused, h_fused = model.apply({"params": params}, x)
        g_fused = jax.grad(loss)(params)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_scan),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_scan),
                                   atol=1e-5)
        for (k, a), (_, b) in zip(sorted(g_fused.items()),
                                  sorted(g_scan.items())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4, err_msg=k)
