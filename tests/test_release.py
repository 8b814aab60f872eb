"""Release bundle (cli/release.py — the reference build.spec/zip analogue,
/root/reference/build.spec: frozen CLI around a source-shipped core)."""

from __future__ import annotations

import json
import subprocess
import sys
import zipfile
from pathlib import Path

from qwen3_asr_gguf_tpu.cli.release import build_release


def test_release_bundle(tmp_path: Path):
    zip_path = build_release(tmp_path, with_native=False)
    assert zip_path.exists()
    with zipfile.ZipFile(zip_path) as zf:
        names = set(zf.namelist())
    root = zip_path.stem
    # package source ships (reference keeps its core as source in-bundle)
    assert f"{root}/qwen3_asr_gguf_tpu/runtime/engine.py" in names
    assert f"{root}/qwen3_asr_gguf_tpu/cli/transcribe.py" in names
    # native sources ship so the target host can rebuild the codecs
    assert f"{root}/native/CMakeLists.txt" in names
    assert any(n.startswith(f"{root}/native/src/") for n in names)
    # launcher shims + metadata
    assert f"{root}/bin/transcribe" in names
    assert f"{root}/RELEASE.json" in names
    meta = json.loads((tmp_path / root / "RELEASE.json").read_text())
    assert meta["name"] == "qwen3-asr-gguf-tpu"
    assert meta["version"]

    # the extracted tree is importable standalone (PYTHONPATH shim contract)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import qwen3_asr_gguf_tpu, qwen3_asr_gguf_tpu.schema; "
         "print(qwen3_asr_gguf_tpu.schema.TranscribeResult)"],
        env={"PYTHONPATH": str(tmp_path / root), "PATH": "/usr/bin:/bin",
             "HOME": "/tmp"},
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "TranscribeResult" in proc.stdout
