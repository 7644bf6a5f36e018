"""Browser toolbox (rtvc_tpu/webui.py): the reference's Qt GUI workflow
(browse → embed → synthesize → vocode → autotune; ref:
toolbox/toolbox.py:46-473) served over HTTP and driven through real
requests against tiny in-memory models."""
import io
import json
import threading
import urllib.error
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
        port=0, synth=synth,  # ui=True default
        stream_kwargs=dict(chunk_frames=8, post_ctx=8, voc_ctx=4,
                           voc_target=300, voc_overlap=100,
                           use_pallas=False, min_frames=20),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, body=b""):
    req = urllib.request.Request(url, data=body, method="POST")
    return urllib.request.urlopen(req, timeout=300)


def _prompt_wav_bytes(seconds=1.0, sr=16000, freq=220):
    t = np.arange(int(seconds * sr)) / sr
    wav = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return _wav_bytes(wav, sr)


def test_page_served_at_root(server):
    with urllib.request.urlopen(server + "/", timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/html")
        page = r.read().decode()
    # the workflow controls all present
    for needle in ("toolbox", "/api/load", "/api/synthesize",
                   "/api/autotune", "Record"):
        assert needle in page, needle


def test_samples_listing(server):
    with urllib.request.urlopen(server + "/api/samples", timeout=60) as r:
        out = json.loads(r.read())
    # the in-repo CC-BY fixtures (samples/README.md)
    assert "p240_00000.mp3" in out["samples"]


def test_load_sample_returns_embedding(server):
    with _post(server + "/api/load?sample=p240_00000.mp3") as r:
        out = json.loads(r.read())
    assert out["name"] == "p240_00000"
    e = np.asarray(out["embed"])
    assert e.shape == (768,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-3)
    assert out["seconds"] > 1.0


def test_load_upload_synthesize_roundtrip(server):
    """Upload → embed → synthesize+vocode → playable WAV with the RTF
    instrument header (ref RTF display: toolbox/toolbox.py:293-298)."""
    with _post(server + "/api/load?name=tone", _prompt_wav_bytes()) as r:
        out = json.loads(r.read())
    assert out["name"] == "tone"

    with _post(server + "/api/synthesize?utt=tone&seed=1&text=hello+web") as r:
        assert r.headers["Content-Type"] == "audio/wav"
        assert float(r.headers["X-RTF"]) > 0
        assert int(r.headers["X-Mel-Frames"]) > 0
        body = r.read()
    with wave.open(io.BytesIO(body), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnframes() > 0


def test_mel_and_projection_displays(server):
    """The Qt toolbox's two drawings (mel spec + utterance projection,
    ref: toolbox/ui.py draw_spec / draw_umap_projections) have JSON
    endpoints the page renders from."""
    _post(server + "/api/load?name=viz_a", _prompt_wav_bytes(freq=250)).read()
    _post(server + "/api/load?name=viz_b", _prompt_wav_bytes(freq=400)).read()
    _post(server + "/api/synthesize?utt=viz_a&seed=0&text=draw+me").read()

    with urllib.request.urlopen(server + "/api/mel", timeout=60) as r:
        m = json.loads(r.read())
    assert m["n_mels"] == 80 and m["frames"] > 0
    assert len(m["mel"]) == 80 and len(m["mel"][0]) == m["frames"]
    assert m["hi"] >= m["lo"]

    with urllib.request.urlopen(server + "/api/projection",
                                timeout=300) as r:
        out = json.loads(r.read())
    names = {p["name"] for p in out["points"]}
    assert {"viz_a", "viz_b"} <= names
    for p in out["points"]:
        assert np.isfinite([p["x"], p["y"]]).all()


def test_autotune_returns_best_seed(server):
    _post(server + "/api/load?name=tune", _prompt_wav_bytes(freq=330)).read()
    with _post(server
               + "/api/autotune?utt=tune&n_seeds=2&text=tune+me") as r:
        assert r.headers["Content-Type"] == "audio/wav"
        best = int(r.headers["X-Best-Seed"])
        sim = float(r.headers["X-Similarity"])
        body = r.read()
    assert best in (0, 1)
    assert -1.0 <= sim <= 1.0
    assert body[:4] == b"RIFF"


def test_stream_get_is_progressive_wav(server):
    """GET /api/stream plays from a plain <audio src> URL — chunked WAV
    with the stored utterance's embedding."""
    _post(server + "/api/load?name=live", _prompt_wav_bytes(freq=260)).read()
    with urllib.request.urlopen(
            server + "/api/stream?utt=live&text=streaming+from+the+page",
            timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()  # urllib de-chunks transparently
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    pcm = np.frombuffer(body[44:], "<i2")
    assert len(pcm) > 400
    # missing utt → JSON 400
    try:
        urllib.request.urlopen(server + "/api/stream?utt=ghost&text=x",
                               timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_error_paths(server):
    for url, code in [
        ("/api/load?sample=nope.mp3", 404),
        ("/api/load?sample=../README.md", 404),   # traversal blocked
        ("/api/load?sample=..%2F..%2Fetc%2Fpasswd", 404),
        ("/api/load", 400),                       # no sample, empty body
        ("/api/synthesize?text=hi", 400),         # no utterance
        ("/api/synthesize?utt=missing&text=hi", 400),
        ("/api/autotune?text=hi", 400),
    ]:
        try:
            _post(server + url)
            raise AssertionError(f"expected HTTPError for {url}")
        except urllib.error.HTTPError as e:
            assert e.code == code, (url, e.code)
    # server still alive
    with urllib.request.urlopen(server + "/health", timeout=60) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_ui_disabled_serves_404_at_root():
    srv = create_server(port=0, synth=None, ui=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            urllib.request.urlopen(url + "/", timeout=60)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
