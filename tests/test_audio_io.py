"""audio.io.load_audio source handling (reference utils.py:57-81 +
qwen_asr/inference/utils.py path/URL/base64/(array,sr) sources)."""

import base64
import io
import threading
import wave
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.audio.io import load_audio

SR = 16_000


def _wav_bytes(audio: np.ndarray, sr: int = SR) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def tone():
    t = np.arange(SR) / SR
    return (np.sin(2 * np.pi * 440 * t) * 0.3).astype(np.float32)


def test_wav_path(tone, tmp_path):
    p = tmp_path / "t.wav"
    p.write_bytes(_wav_bytes(tone))
    out = load_audio(str(p))
    assert out.shape == (SR,)
    assert np.abs(out - tone).max() < 1e-3


def test_array_and_tuple_sources(tone):
    assert np.allclose(load_audio(tone), tone)
    out = load_audio((tone, SR))
    assert out.shape == (SR,)


def test_base64_data_uri(tone):
    uri = "data:audio/wav;base64," + base64.b64encode(_wav_bytes(tone)).decode()
    out = load_audio(uri)
    assert out.shape == (SR,)
    assert np.abs(out - tone).max() < 1e-3


def test_window_start_duration(tone, tmp_path):
    p = tmp_path / "t.wav"
    p.write_bytes(_wav_bytes(tone))
    out = load_audio(str(p), start_second=0.25, duration=0.5)
    assert out.shape == (SR // 2,)


def test_http_url_source(tone):
    """http(s) URLs load like the official stack (qwen_asr utils)."""
    payload = _wav_bytes(tone)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/clip.wav"
        out = load_audio(url)
        assert out.shape == (SR,)
        assert np.abs(out - tone).max() < 1e-3
    finally:
        srv.shutdown()
