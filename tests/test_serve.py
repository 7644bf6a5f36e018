"""HTTP serving front-end (rtvc_tpu/serve.py): health, embed, batch clone,
and chunked-transfer streaming clone, driven through real HTTP requests
against tiny in-memory models."""
import io
import json
import threading
import urllib.request
import wave

import numpy as np
import pytest

from rtvc_tpu.config.synthesizer import TacotronParams
from rtvc_tpu.config.vocoder import WaveRNNParams
from rtvc_tpu.inference import encoder as enc
from rtvc_tpu.inference import synthesizer as syn_inf
from rtvc_tpu.inference import vocoder as voc_inf
from rtvc_tpu.models import factories
from rtvc_tpu.serve import _wav_bytes, create_server

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server():
    enc.init_random_model(seed=0)
    syn_cfg = TacotronParams(
        embed_dims=32, encoder_dims=16, decoder_dims=32, postnet_dims=16,
        encoder_K=4, lstm_dims=32, postnet_K=4, num_highways=2,
        max_decoder_steps=120,
    )
    synth = syn_inf.Synthesizer(model_fpath="unused", verbose=False)
    synth.load_bundle(
        factories.init_syn_model(factories.MODEL_TYPE_TACOTRON, seed=0,
                                 override_hp=syn_cfg), r=2,
    )
    voc_cfg = WaveRNNParams(
        rnn_dims=32, fc_dims=32, compute_dims=16, res_out_dims=32,
        res_blocks=2, gen_target=400, gen_overlap=100,
    )
    voc_inf.load_bundle(factories.init_voc_model(
        factories.MODEL_TYPE_RUNTIMERACER, seed=0, override_hp=voc_cfg
    ))

    srv = create_server(
        port=0, synth=synth,
        stream_kwargs=dict(chunk_frames=8, post_ctx=8, voc_ctx=4,
                           voc_target=300, voc_overlap=100,
                           use_pallas=False, min_frames=20),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _prompt_wav_bytes(seconds=1.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    return _wav_bytes(wav, sr)


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    return urllib.request.urlopen(req, timeout=300)


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=60) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok" and info["synthesizer"] and info["vocoder"]


def test_embed(server):
    with _post(server + "/embed", _prompt_wav_bytes()) as r:
        out = json.loads(r.read())
    e = np.asarray(out["embed"])
    assert e.shape == (768,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-3)


def test_clone_returns_wav(server):
    with _post(server + "/clone?text=hello+server", _prompt_wav_bytes()) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()
    with wave.open(io.BytesIO(body), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnframes() > 0


def test_garbage_body_is_500_json_and_server_survives(server):
    """Malformed WAV bodies must produce a JSON 500, not kill the worker;
    the server keeps answering afterwards."""
    for body in (b"", b"not a wav at all", b"RIFF\x00\x00"):
        try:
            _post(server + "/embed", body)
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.loads(e.read())
    with urllib.request.urlopen(server + "/health", timeout=60) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_clone_without_text_is_400(server):
    try:
        _post(server + "/clone", _prompt_wav_bytes())
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_stream_is_chunked_playable_wav(server):
    req = urllib.request.Request(
        server + "/stream?text=streaming+hello", data=_prompt_wav_bytes(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        # urllib de-chunks transfer-encoding transparently
        body = r.read()
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    pcm = np.frombuffer(body[44:], "<i2")
    assert len(pcm) > 400  # several chunks of real audio
    assert np.isfinite(pcm.astype(np.float32)).all()


def test_stream_forward_tacotron_checkpoint():
    """Round-4: /stream serves NAR checkpoints too — the ForwardTacotron
    mel arrives in one pass and the chunked vocoder streams it (routing
    inside stream_clone; ref forward_tacotron.py:185-204)."""
    import urllib.error  # noqa: F401  (parity with module imports)

    from rtvc_tpu.config.synthesizer import ForwardTacotronParams

    enc.init_random_model(seed=0)
    prev_voc = voc_inf._model  # restore the module vocoder afterwards
    syn_cfg = ForwardTacotronParams(
        embed_dims=16, series_embed_dims=8,
        duration_conv_dims=12, duration_rnn_dims=8,
        pitch_conv_dims=12, pitch_rnn_dims=8,
        energy_conv_dims=12, energy_rnn_dims=8,
        prenet_dims=16, prenet_k=2, prenet_num_highways=1,
        rnn_dims=16, postnet_dims=12, postnet_k=2, postnet_num_highways=1,
    )
    synth = syn_inf.Synthesizer(model_fpath="unused", verbose=False)
    synth.load_bundle(factories.init_syn_model(
        factories.MODEL_TYPE_FORWARD_TACOTRON, seed=0, override_hp=syn_cfg
    ))
    voc_cfg = WaveRNNParams(
        rnn_dims=32, fc_dims=32, compute_dims=16, res_out_dims=32,
        res_blocks=2, gen_target=400, gen_overlap=100,
    )
    voc_inf.load_bundle(factories.init_voc_model(
        factories.MODEL_TYPE_RUNTIMERACER, seed=0, override_hp=voc_cfg
    ))
    srv = create_server(
        port=0, synth=synth,
        stream_kwargs=dict(chunk_frames=12, voc_ctx=6, voc_target=300,
                           voc_overlap=100, use_pallas=False),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        req = urllib.request.Request(
            url + "/stream?text=nar+streaming", data=_prompt_wav_bytes(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        pcm = np.frombuffer(body[44:], "<i2")
        assert len(pcm) > 400
        assert np.isfinite(pcm.astype(np.float32)).all()
    finally:
        srv.shutdown()
        voc_inf._model = prev_voc
