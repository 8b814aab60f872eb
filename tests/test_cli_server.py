"""CLI and OpenAI-compatible server tests (tiny synthetic checkpoint)."""

import http.client
import io
import json
import threading
import wave
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
from qwen3_asr_gguf_tpu.schema import ASREngineConfig
from qwen3_asr_gguf_tpu.cli.serve import ASRServer, make_handler, parse_multipart


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv_ckpt")
    make_synthetic_checkpoint(str(d), "tiny", quant="f16")
    return str(d)


def _wav_bytes(seconds=1.0):
    t = np.arange(int(16000 * seconds)) / 16000
    pcm = (np.sin(2 * np.pi * 440 * t) * 0.3 * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _multipart(fields: dict) -> tuple[bytes, str]:
    boundary = "testboundary123"
    out = b""
    for name, value in fields.items():
        out += f"--{boundary}\r\n".encode()
        if isinstance(value, tuple):
            fname, payload = value
            out += f'Content-Disposition: form-data; name="{name}"; filename="{fname}"\r\n'.encode()
            out += b"Content-Type: application/octet-stream\r\n\r\n" + payload + b"\r\n"
        else:
            out += f'Content-Disposition: form-data; name="{name}"\r\n\r\n{value}\r\n'.encode()
    out += f"--{boundary}--\r\n".encode()
    return out, f"multipart/form-data; boundary={boundary}"


def test_parse_multipart_roundtrip():
    body, ctype = _multipart({"file": ("a.wav", b"\x01\x02"), "language": "zh"})
    parts = parse_multipart(body, ctype)
    assert parts["file"] == ("a.wav", b"\x01\x02")
    assert parts["language"][1] == b"zh"


@pytest.fixture(scope="module")
def server(model_dir):
    engine = QwenASREngine(ASREngineConfig(
        model_dir=model_dir, llm_fn="qwen3_asr_llm.f16.gguf", precision="f32",
        chunk_size=2.0, n_ctx=512, verbose=False, max_new_tokens=12, decode_block=8,
    ))
    srv = ASRServer(engine)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address
    httpd.shutdown()


def _request(addr, method, path, body=None, ctype=None):
    conn = http.client.HTTPConnection(*addr, timeout=120)
    headers = {"Content-Type": ctype} if ctype else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_health_models_stats(server):
    status, data = _request(server, "GET", "/health")
    assert status == 200 and json.loads(data)["status"] == "ok"
    status, data = _request(server, "GET", "/v1/models")
    assert status == 200 and json.loads(data)["data"][0]["object"] == "model"
    status, data = _request(server, "GET", "/stats")
    assert status == 200 and "requests" in json.loads(data)


def test_transcription_json(server):
    body, ctype = _multipart({
        "file": ("t.wav", _wav_bytes()),
        "language": "zh",
        "temperature": "0",
        "response_format": "json",
    })
    status, data = _request(server, "POST", "/v1/audio/transcriptions", body, ctype)
    assert status == 200, data
    assert "text" in json.loads(data)


def test_transcription_text_and_verbose(server):
    body, ctype = _multipart({"file": ("t.wav", _wav_bytes()), "response_format": "text"})
    status, data = _request(server, "POST", "/v1/audio/transcriptions", body, ctype)
    assert status == 200
    body, ctype = _multipart({"file": ("t.wav", _wav_bytes()), "response_format": "verbose_json"})
    status, data = _request(server, "POST", "/v1/audio/transcriptions", body, ctype)
    payload = json.loads(data)
    assert payload["task"] == "transcribe"
    assert "words" in payload and "segments" in payload
    assert abs(payload["duration"] - 1.0) < 0.01


def test_transcription_errors(server):
    body, ctype = _multipart({"language": "zh"})
    status, data = _request(server, "POST", "/v1/audio/transcriptions", body, ctype)
    assert status == 400
    assert "file" in json.loads(data)["error"]["message"]

    body, ctype = _multipart({"file": ("t.wav", _wav_bytes()), "language": "xx-nope"})
    status, data = _request(server, "POST", "/v1/audio/transcriptions", body, ctype)
    assert status == 400

    status, _ = _request(server, "POST", "/v1/audio/nope", b"", "text/plain")
    assert status == 404


def test_cli_transcribe(model_dir, tmp_path, monkeypatch, capsys):
    from qwen3_asr_gguf_tpu.cli.transcribe import main

    wav = tmp_path / "in.wav"
    wav.write_bytes(_wav_bytes())
    rc = main([
        str(wav), "--model-dir", model_dir, "--prec", "f32",
        "--chunk-size", "2", "--n-ctx", "512", "--temperature", "0", "-y", "--quiet",
    ])
    assert rc == 0
    assert (tmp_path / "in.txt").exists()


def test_cli_missing_model(tmp_path):
    from qwen3_asr_gguf_tpu.cli.transcribe import main

    wav = tmp_path / "in.wav"
    wav.write_bytes(_wav_bytes())
    rc = main([str(wav), "--model-dir", str(tmp_path / "nope")])
    assert rc == 2


def test_concurrent_requests_microbatch(model_dir):
    """4 concurrent clients coalesce into a vmapped batch."""
    import concurrent.futures

    from qwen3_asr_gguf_tpu.runtime.microbatch import MicroBatcher

    engine = QwenASREngine(ASREngineConfig(
        model_dir=model_dir, llm_fn="qwen3_asr_llm.f16.gguf", precision="f32",
        chunk_size=2.0, n_ctx=512, verbose=False, max_new_tokens=10, decode_block=8,
    ))
    batcher = MicroBatcher(engine, window_s=0.2, max_batch=8)
    srv = ASRServer(engine, batcher=batcher)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    addr = httpd.server_address
    try:
        def one(freq):
            body, ctype = _multipart({
                "file": ("t.wav", _wav_bytes(1.0)),
                "language": "en",
                "temperature": "0",
            })
            return _request(addr, "POST", "/v1/audio/transcriptions", body, ctype)

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            results = list(ex.map(one, [300, 400, 500, 600]))
        assert all(status == 200 for status, _ in results)
        assert all(b"text" in data for _, data in results)
        status, data = _request(addr, "GET", "/stats")
        stats = json.loads(data)
        assert stats["requests"] == 4
        assert stats["batched_requests"] >= 2  # at least one real batch formed
    finally:
        httpd.shutdown()
        batcher.close()


def test_demo_page_served(server):
    """/demo serves the file-upload UI (reference qwen_asr/cli/demo.py
    upload demo, dependency-free)."""
    status, data = _request(server, "GET", "/demo")
    assert status == 200
    html = data.decode("utf-8")
    assert "/v1/audio/transcriptions" in html
    assert "<input type=\"file\"" in html
