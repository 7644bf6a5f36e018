"""Streaming clone (rtvc_tpu/inference/streaming.py): chunked Tacotron
decode with carried state + chunked postnet + lookback vocoding.

Key claims verified:
  * the streamed RAW decoder trajectory is bit-identical to the batch
    ``tacotron_generate`` path (same key derivation, chunked scan vs
    while_loop);
  * chunk waveforms are contiguous, finite, and total duration matches the
    batch clone's mel length;
  * the chunked-postnet approximation (missing right context at the live
    edge) stays bounded vs the batch postnet output.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.config.vocoder import WaveRNNParams
from rtvc_tpu.inference import synthesizer as syn_inf
from rtvc_tpu.inference.streaming import stream_clone
from rtvc_tpu.models import factories

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def models():
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
        res_blocks=2,
    )
    voc_bundle = factories.init_voc_model(
        factories.MODEL_TYPE_RUNTIMERACER, seed=0, override_hp=voc_cfg
    )
    return synth, voc_bundle


def _embed(seed=0):
    e = np.random.default_rng(seed).uniform(0, 1, 768).astype(np.float32)
    return e / np.linalg.norm(e)


TEXT = "streaming voice cloning test"


def test_stream_chunks_contiguous_and_sized(models):
    synth, voc = models
    hop = voc.dims.hop_length
    # chunk of 4 iters (8 frames at r=2): the stop rule can't fire before
    # i·r > 10, so a random-weight model still yields ≥ 2 chunks; force
    # ≥ 40 decoded frames so the length invariant below is checkable
    chunks = list(stream_clone(
        synth, voc.variables, voc.dims, TEXT, _embed(), seed=1,
        chunk_frames=8, post_ctx=16, voc_ctx=8, voc_target=400,
        voc_overlap=100, use_pallas=False, min_frames=40,
    ))
    assert len(chunks) >= 5, "stop suppression should force many chunks"
    assert chunks[-1].final and not any(c.final for c in chunks[:-1])
    assert [c.index for c in chunks] == list(range(len(chunks)))
    total = sum(len(c.wav) for c in chunks)
    for c in chunks:
        assert np.isfinite(c.wav).all()
        assert c.t_emitted > 0
    # length invariant (round-3 review fix): every chunk's wav is one frame
    # short, recovered from the next chunk's context — the stream must
    # total (N_frames − 1)·hop like the batch path, for N ≥ min_frames
    assert total >= (40 - 1) * hop - 2 * hop, total

    # regression (round-3 review): mid-stream chunks must NOT carry the
    # end-of-utterance fade — the tail of a non-final chunk keeps the same
    # energy scale as its body (a faded tail would sit near zero)
    for c in chunks[:-1]:
        if len(c.wav) > 3 * hop:
            body_rms = float(np.sqrt(np.mean(c.wav ** 2))) + 1e-12
            tail_rms = float(np.sqrt(np.mean(c.wav[-hop:] ** 2)))
            assert tail_rms > 0.2 * body_rms, (tail_rms, body_rms)
    # …and the FINAL chunk does fade to silence like the batch path
    last = chunks[-1].wav
    if len(last) > hop:
        assert abs(last[-1]) < 1e-3


def test_voc_ctx_clamped_to_cover_boundary_and_xfade(models):
    """Regression (round-3 advisor): voc_ctx=0 used to route every chunk
    through the first-chunk trim branch, dropping one hop per chunk. The
    clamp voc_ctx >= 1 + xfade_frames keeps the (Σvalid − 1)·hop length
    invariant for any requested context."""
    synth, voc = models
    hop = voc.dims.hop_length
    for voc_ctx, xfade in ((0, 2), (0, 0), (1, 2)):
        chunks = list(stream_clone(
            synth, voc.variables, voc.dims, TEXT, _embed(), seed=1,
            chunk_frames=8, post_ctx=8, voc_ctx=voc_ctx,
            xfade_frames=xfade, voc_target=300, voc_overlap=100,
            use_pallas=False, min_frames=40,
        ))
        assert chunks[-1].final
        total = sum(len(c.wav) for c in chunks)
        # ≥ min_frames decoded → stream must carry (N−1)·hop samples; a
        # per-chunk hop (or xfade) loss would fall far below this
        assert total >= (40 - 1) * hop, (voc_ctx, xfade, total)


def test_ramped_first_chunk(models):
    """first_chunk_frames yields a smaller opening chunk (the TTFA lever)
    while keeping the stream contiguous and final."""
    synth, voc = models
    hop = voc.dims.hop_length
    chunks = list(stream_clone(
        synth, voc.variables, voc.dims, TEXT, _embed(), seed=1,
        chunk_frames=24, first_chunk_frames=8, post_ctx=16, voc_ctx=8,
        voc_target=400, voc_overlap=100, use_pallas=False, min_frames=40,
    ))
    assert len(chunks) >= 3
    # opening chunk ≈ 8 frames of audio (xfade trim makes it slightly
    # shorter), later chunks are the steady-state size
    assert len(chunks[0].wav) <= 8 * hop
    assert len(chunks[1].wav) > len(chunks[0].wav)
    assert chunks[-1].final
    for c in chunks:
        assert np.isfinite(c.wav).all()


def test_mol_checkpoint_streams_without_mulaw(models, monkeypatch):
    """Regression (round-3 review): a MOL vocoder with the config default
    mu_law=True must NOT get mu-law decode applied to its continuous
    samples — the mode guard mirrors wavernn_generate's. Asserted by
    spying on the mu_law flag handed to the jitted chunk chain."""
    import rtvc_tpu.inference.streaming as st

    synth, _ = models
    voc_cfg = WaveRNNParams(
        mode="MOL", rnn_dims=32, fc_dims=32, compute_dims=16,
        res_out_dims=32, res_blocks=2,  # mu_law stays the default True
    )
    voc = factories.init_voc_model(
        factories.MODEL_TYPE_RUNTIMERACER, seed=0, override_hp=voc_cfg
    )
    assert voc.config.mu_law is True  # the trap the guard must defuse

    captured = []
    orig = st._make_post_vocode

    def spy(*args, **kwargs):
        captured.append(args[7] if len(args) > 7 else kwargs["mu_law"])
        return orig(*args, **kwargs)

    monkeypatch.setattr(st, "_make_post_vocode", spy)
    chunks = list(stream_clone(
        synth, voc.variables, voc.dims, TEXT, _embed(), seed=2,
        chunk_frames=8, post_ctx=8, voc_ctx=4, voc_target=300,
        voc_overlap=100, use_pallas=False, min_frames=24,
        voc_config=voc.config,
    ))
    assert captured and all(m is False for m in captured)
    wav = np.concatenate([c.wav for c in chunks])
    assert np.isfinite(wav).all() and len(wav) > 0


def test_streamed_raw_decode_matches_batch(models):
    """Same seed → the chunked decoder walks the exact trajectory of the
    batch while_loop (state carry + RNG folding are equivalence-critical)."""
    from rtvc_tpu.inference.streaming import _make_chunk_decoder
    from rtvc_tpu.models import tacotron as taco

    synth, _ = models
    d, variables, r = synth._model.dims, synth._model.variables, synth._r
    emb = _embed()

    from rtvc_tpu.config import preprocessing
    from rtvc_tpu.inference.synthesizer import _CHAR_BUCKET, pad1d
    from rtvc_tpu.text import text_to_sequence

    seq = text_to_sequence(TEXT, preprocessing.cleaner_names)
    bl = -(-len(seq) // _CHAR_BUCKET) * _CHAR_BUCKET
    chars = jnp.asarray(pad1d(seq, bl)[None].astype(np.int32))
    embeds = jnp.asarray(emb[None])
    rng = jax.random.PRNGKey(5)

    max_steps = 96
    mel_batch, _, _, n_valid = jax.jit(
        lambda v, c, e, k: taco.tacotron_generate(
            v, d, c, e, r, k, max_steps=max_steps
        )
    )(variables, chars, embeds, rng)
    n_valid = int(n_valid)

    # streamed: chunks of 8 iters with the same key derivation
    k_enc, k_dec, _ = jax.random.split(rng, 3)
    enc_seq, enc_proj, _ = taco.encode(
        variables, d, chars, embeds, train=False, rng=k_enc
    )
    mask = (chars != 0).astype(jnp.float32)
    dec = _make_chunk_decoder(d, r, 8)
    carry = taco.init_decoder_carry(d, 1, chars.shape[1])
    prev = jnp.zeros((1, d.n_mels))
    done = jnp.asarray(False)
    frames = []
    for start in range(0, max_steps // r, 8):
        mel_c, carry, prev, done, valid = dec(
            variables, carry, prev, done, jnp.asarray(start),
            enc_seq, enc_proj, mask, k_dec,
        )
        frames.append(np.asarray(mel_c)[0][:, : int(valid) * r])
        if bool(done):
            break
    streamed = np.concatenate(frames, axis=1)

    n = min(n_valid, streamed.shape[1])
    assert n > 0
    np.testing.assert_allclose(
        streamed[:, :n], np.asarray(mel_batch)[0][:, :n], atol=1e-5
    )


def test_chunked_postnet_approximation_bounded(models):
    """The live-edge postnet (left context only) must stay close to the
    batch postnet over the interior of each chunk."""
    synth, voc = models
    d, variables = synth._model.dims, synth._model.variables
    rng = np.random.default_rng(3)
    T = 96
    raw = rng.uniform(-4, 4, (1, d.n_mels, T)).astype(np.float32)

    full = np.asarray(synth._postnet_jit(variables, jnp.asarray(raw)))[0]

    post_ctx, chunk = 32, 24
    outs = []
    for s in range(0, T, chunk):
        win = np.full((1, d.n_mels, post_ctx + chunk), -4.0, np.float32)
        ctx = raw[0][:, max(0, s - post_ctx) : s]
        win[0, :, post_ctx - ctx.shape[1] : post_ctx] = ctx
        n = min(chunk, T - s)
        win[0, :, post_ctx : post_ctx + n] = raw[0][:, s : s + n]
        out = np.asarray(synth._postnet_jit(variables, jnp.asarray(win)))[0]
        outs.append(out[:, post_ctx : post_ctx + n])
    chunked = np.concatenate(outs, axis=1)

    # bounded approximation: small mean deviation on the normalized scale
    err = np.mean(np.abs(chunked - full))
    assert err < 0.25, err


# ---------------------------------------------------------------------------
# NAR streaming (round-4: ForwardTacotron/FastPitch feed the chunked
# vocoder — their mel arrives in one parallel pass, ref
# forward_tacotron.py:185-204, so only the vocoder streams)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nar_models():
    from rtvc_tpu.config.synthesizer import ForwardTacotronParams

    syn_cfg = ForwardTacotronParams(
        embed_dims=16, series_embed_dims=8,
        duration_conv_dims=12, duration_rnn_dims=8,
        pitch_conv_dims=12, pitch_rnn_dims=8,
        energy_conv_dims=12, energy_rnn_dims=8,
        prenet_dims=16, prenet_k=2, prenet_num_highways=1,
        rnn_dims=16, postnet_dims=12, postnet_k=2, postnet_num_highways=1,
    )
    syn_bundle = factories.init_syn_model(
        factories.MODEL_TYPE_FORWARD_TACOTRON, seed=0, override_hp=syn_cfg
    )
    synth = syn_inf.Synthesizer(model_fpath="unused", verbose=False)
    synth.load_bundle(syn_bundle)

    voc_cfg = WaveRNNParams(
        rnn_dims=32, fc_dims=32, compute_dims=16, res_out_dims=32,
        res_blocks=2,
    )
    voc_bundle = factories.init_voc_model(
        factories.MODEL_TYPE_RUNTIMERACER, seed=0, override_hp=voc_cfg
    )
    return synth, voc_bundle


def test_stream_vocode_length_invariant(models):
    """Direct chunked vocoding of a precomputed mel totals (T−1)·hop — the
    batch infer_waveform length for the same mel."""
    from rtvc_tpu.inference.streaming import stream_vocode

    _, voc = models
    hop = voc.dims.hop_length
    rng = np.random.default_rng(0)
    for T, chunk, first in ((40, 12, None), (40, 12, 4), (37, 16, None)):
        mel = rng.uniform(-4, 4, (80, T)).astype(np.float32)
        chunks = list(stream_vocode(
            voc.variables, voc.dims, mel, seed=3, chunk_frames=chunk,
            voc_ctx=6, voc_target=300, voc_overlap=100, use_pallas=False,
            first_chunk_frames=first, voc_config=voc.config,
        ))
        assert chunks and chunks[-1].final
        assert [c.index for c in chunks] == list(range(len(chunks)))
        total = sum(len(c.wav) for c in chunks)
        assert total == (T - 1) * hop, (T, chunk, first, total)
        for c in chunks:
            assert np.isfinite(c.wav).all()


def test_nar_stream_clone_routes_to_chunked_vocoder(nar_models):
    """stream_clone on a ForwardTacotron synth streams the vocoder over the
    one-pass mel; stream totals match the batch mel's (T−1)·hop."""
    synth, voc = nar_models
    hop = voc.dims.hop_length
    mel = synth.synthesize_spectrograms([TEXT], [_embed()], seed=5)[0]
    chunks = list(stream_clone(
        synth, voc.variables, voc.dims, TEXT, _embed(), seed=5,
        chunk_frames=12, voc_ctx=6, voc_target=300, voc_overlap=100,
        use_pallas=False, voc_config=voc.config,
    ))
    assert chunks and chunks[-1].final and not any(
        c.final for c in chunks[:-1]
    )
    total = sum(len(c.wav) for c in chunks)
    assert total == (mel.shape[1] - 1) * hop, (mel.shape, total)
    # mid-stream chunks keep body energy (no per-chunk fade)
    for c in chunks[:-1]:
        if len(c.wav) > 3 * hop:
            body_rms = float(np.sqrt(np.mean(c.wav ** 2))) + 1e-12
            tail_rms = float(np.sqrt(np.mean(c.wav[-hop:] ** 2)))
            assert tail_rms > 0.2 * body_rms
    # final chunk fades to silence like the batch path
    assert abs(chunks[-1].wav[-1]) < 1e-3


def test_fastpitch_stream_clone(nar_models):
    """FastPitch checkpoints stream through the same NAR route."""
    from rtvc_tpu.config.synthesizer import FastPitchParams

    _, voc = nar_models
    cfg = FastPitchParams(
        embed_dims=16, n_heads=2, conv_kernel=3, conv_dims=32,
        n_layers_enc=2, n_layers_dec=2,
        series_d_model=8, series_n_heads=1, series_layers=1,
        series_d_fft=16,
    )
    synth = syn_inf.Synthesizer(model_fpath="unused", verbose=False)
    synth.load_bundle(factories.init_syn_model(
        factories.MODEL_TYPE_FASTPITCH, seed=0, override_hp=cfg
    ))
    hop = voc.dims.hop_length
    mel = synth.synthesize_spectrograms([TEXT], [_embed()], seed=2)[0]
    chunks = list(stream_clone(
        synth, voc.variables, voc.dims, TEXT, _embed(), seed=2,
        chunk_frames=12, voc_ctx=6, voc_target=300, voc_overlap=100,
        use_pallas=False, voc_config=voc.config,
    ))
    assert chunks and chunks[-1].final
    total = sum(len(c.wav) for c in chunks)
    assert total == (mel.shape[1] - 1) * hop
