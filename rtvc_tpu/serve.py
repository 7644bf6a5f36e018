"""Minimal production HTTP serving front-end for the clone pipeline.

Dependency-free (stdlib ``http.server``), wrapping the public inference
APIs the same way ``demo_cli`` does but as a long-lived service — the
deployment shape the reference never ships (its closest artifact is the
interactive REPL, ref: demo_cli.py:129-225).

Endpoints (all reads/writes are audio bytes or JSON — no filesystem):

  * ``GET  /``                  → browser toolbox (rtvc_tpu/webui.py —
    the reference's Qt GUI workflow, served as one HTML page)
  * ``GET  /health``            → {"status": "ok", platform, models}
  * ``POST /embed``             body = WAV bytes → {"embed": [768 floats]}
  * ``POST /clone?text=...``    body = WAV prompt → WAV clone (batch path)
  * ``POST /stream?text=...``   body = WAV prompt → chunked-transfer WAV:
    the header is written immediately and 16-bit PCM chunks follow as the
    streaming clone produces them (first audio ~162 ms after the request
    device-side warm; see docs/SERVING.md) — a player can start as soon
    as bytes arrive.

Start: ``python -m rtvc_tpu.serve -e enc.ckpt -s syn.ckpt -v voc.ckpt``
or embed via ``create_server(...)`` (used by tests with in-memory tiny
models). Binds loopback by default. Single worker: requests serialize over
one device — front with a queue/LB for fleet serving.
"""
from __future__ import annotations

import io
import json
import struct
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(_pcm16(wav))
    return buf.getvalue()


def _pcm16(wav: np.ndarray) -> bytes:
    x = np.clip(np.asarray(wav, np.float64), -1.0, 1.0)
    return (x * 32767.0).astype("<i2").tobytes()


def _parse_wav(body: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(body), "rb") as w:
        sr = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, sr


def _streaming_wav_header(sr: int) -> bytes:
    """A WAV header with maximal data length — standard trick for
    unknown-length streams (players read until the connection closes)."""
    hdr = io.BytesIO()
    data_len = 0x7FFFF000
    hdr.write(b"RIFF")
    hdr.write(struct.pack("<I", 36 + data_len))
    hdr.write(b"WAVEfmt ")
    hdr.write(struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
    hdr.write(b"data")
    hdr.write(struct.pack("<I", data_len))
    return hdr.getvalue()


def stream_chunked_wav(handler, gen, model_lock, sr: int) -> None:
    """Write a chunked-transfer WAV response from a wav-chunk generator
    (shared by POST /stream and the web toolbox's GET /api/stream).

    Sends the headers itself. Device work (advancing the generator) runs
    under ``model_lock`` per chunk; the chunked writes to the client happen
    OUTSIDE the lock so a slow consumer never starves other requests.
    Post-header failures drop the connection — a second status line would
    corrupt the chunked framing, so the client just sees a truncated
    stream."""
    handler.send_response(200)
    handler.send_header("Content-Type", "audio/wav")
    handler.send_header("Transfer-Encoding", "chunked")
    handler.end_headers()

    def chunk_out(data: bytes):
        handler.wfile.write(b"%x\r\n" % len(data))
        handler.wfile.write(data)
        handler.wfile.write(b"\r\n")

    try:
        chunk_out(_streaming_wav_header(sr))
        while True:
            with model_lock:
                piece = next(gen, None)
            if piece is None:
                break
            if len(piece.wav):
                chunk_out(_pcm16(piece.wav))
        handler.wfile.write(b"0\r\n\r\n")
    except BrokenPipeError:
        pass
    except Exception:
        handler.close_connection = True


def create_server(host: str = "127.0.0.1", port: int = 0,
                  synth=None, stream_kwargs=None, ui: bool = True,
                  samples_dir=None):
    """Build the ThreadingHTTPServer. Models must already be loaded into
    the ``rtvc_tpu.inference`` module singletons (encoder + vocoder) and
    ``synth`` must be a loaded Synthesizer. ``stream_kwargs`` are passed
    through to ``stream_clone`` (chunk sizes etc.). ``ui=True`` also mounts
    the browser toolbox (``GET /`` + ``/api/*``, rtvc_tpu/webui.py)."""
    import jax

    from rtvc_tpu import webui
    from rtvc_tpu.config import sp
    from rtvc_tpu.inference import encoder, vocoder
    from rtvc_tpu.inference import vocoder as voc_mod

    import threading

    ui_state = webui.UIState(samples_dir) if ui else None

    sr = sp.sample_rate
    skw = dict(stream_kwargs or {})
    if "voc_config" not in skw and voc_mod._model is not None:
        skw["voc_config"] = voc_mod._model.config
    # One model section at a time: the inference singletons keep mutable
    # state (vocoder seed counter) and a single device serves one stream
    # best; concurrent requests queue here instead of interleaving.
    # CRITICAL scope rule (review r3): client socket I/O must happen
    # OUTSIDE the lock — a slow uploader or a client consuming a stream at
    # playback speed would otherwise wedge every model endpoint.
    model_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        # chunked transfer coding requires HTTP/1.1 — the BaseHTTPRequestHandler
        # default (HTTP/1.0) makes conforming clients ignore Transfer-Encoding
        # and read chunk-size framing as audio bytes
        protocol_version = "HTTP/1.1"
        # bound socket reads/writes so a stalled client can't pin a worker
        timeout = 120

        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _audio(self, wav):
            body = _wav_bytes(wav, sr)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def _embed_from_wav(self, body: bytes):
            wav, in_sr = _parse_wav(body)
            pre = encoder.preprocess_wav(wav, source_sr=in_sr)
            return encoder.embed_utterance(pre)

        def do_GET(self):  # noqa: N802
            if urlparse(self.path).path == "/health":
                self._json({
                    "status": "ok",
                    "platform": jax.devices()[0].platform,
                    "synthesizer": synth is not None,
                    "vocoder": vocoder.is_loaded(),
                })
            elif ui_state is not None:
                # pre-header failures surface as JSON; the streaming route
                # handles its own post-header errors internally
                try:
                    handled = webui.handle_get(
                        self, ui_state, model_lock=model_lock, synth=synth,
                        stream_kwargs=skw)
                except Exception as e:
                    try:
                        self._json({"error": repr(e)[:200]}, 500)
                    except Exception:
                        pass
                    return
                if not handled:
                    self.send_error(404)
            else:
                self.send_error(404)

        def do_POST(self):  # noqa: N802
            streaming_started = False
            try:
                url = urlparse(self.path)
                q = parse_qs(url.query)
                if url.path == "/embed":
                    body = self._read_body()  # socket read OUTSIDE the lock
                    with model_lock:
                        emb = self._embed_from_wav(body)
                    self._json({"embed": [float(v) for v in emb]})
                elif url.path == "/clone":
                    text = (q.get("text") or [""])[0]
                    if not text:
                        return self._json({"error": "missing ?text="}, 400)
                    body = self._read_body()
                    with model_lock:
                        emb = self._embed_from_wav(body)
                        [mel] = synth.synthesize_spectrograms([text], [emb])
                        wav = vocoder.infer_waveform(mel)
                    self._audio(wav)
                elif url.path == "/stream":
                    text = (q.get("text") or [""])[0]
                    if not text:
                        return self._json({"error": "missing ?text="}, 400)
                    m = voc_mod._model
                    if m is None:
                        return self._json(
                            {"error": "streaming needs the JAX vocoder "
                                      "backend loaded"}, 400)
                    from rtvc_tpu.inference.streaming import stream_clone

                    body = self._read_body()
                    with model_lock:
                        emb = self._embed_from_wav(body)
                    gen = stream_clone(
                        synth, m.variables, m.dims, text, emb, **skw
                    )
                    streaming_started = True
                    stream_chunked_wav(self, gen, model_lock, sr)
                elif ui_state is not None and webui.handle_post(
                        self, ui_state, model_lock, synth):
                    pass
                else:
                    self.send_error(404)
            except BrokenPipeError:
                pass
            except Exception as e:  # surface errors as JSON, keep serving
                if streaming_started:
                    # headers are out — writing a second status line would
                    # corrupt the chunked framing; just drop the connection
                    # (the client sees a truncated stream)
                    self.close_connection = True
                    return
                try:
                    self._json({"error": repr(e)[:200]}, 500)
                except Exception:
                    pass

    return ThreadingHTTPServer((host, port), Handler)


def main():
    import argparse
    from pathlib import Path

    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("-e", "--enc_model_fpath", type=Path, required=True)
    parser.add_argument("-s", "--syn_model_fpath", type=Path, required=True)
    parser.add_argument("-v", "--voc_model_fpath", type=Path, required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--samples_dir", type=Path, default=None,
                        help="Audio dir the browser toolbox lists "
                             "(default: the in-repo samples/).")
    parser.add_argument("--no_ui", action="store_true",
                        help="API only — don't serve the browser toolbox.")
    args = parser.parse_args()

    from rtvc_tpu.inference import encoder, synthesizer, vocoder
    from rtvc_tpu.utils import modelutils
    from rtvc_tpu.utils.cache import enable_persistent_cache

    # serving needs all three stages — fail with training guidance, not a
    # load-time stack trace (ref check_model_paths, utils/modelutils.py:3-24)
    still_missing = modelutils.missing_models(
        args.enc_model_fpath, args.syn_model_fpath, args.voc_model_fpath
    )
    if still_missing:
        modelutils.model_files_missing(still_missing)
        raise SystemExit(-1)

    enable_persistent_cache()
    encoder.load_model(args.enc_model_fpath)
    synth = synthesizer.Synthesizer(args.syn_model_fpath)
    synth.load()
    vocoder.load_model(args.voc_model_fpath)
    vocoder.warmup()

    server = create_server(args.host, args.port, synth=synth,
                           ui=not args.no_ui, samples_dir=args.samples_dir)
    print(f"Serving on http://{args.host}:{server.server_address[1]} "
          f"(browser toolbox at /, API: /health /embed /clone /stream)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
