"""Self-contained release bundle builder.

TPU-native analogue of the reference's frozen-binary packaging
(build.spec + zip release, /root/reference/build.spec): the reference
freezes the CLI with PyInstaller but deliberately keeps its core
package (`qwen_asr_gguf`) as SOURCE files inside the bundle
(build.spec `private_module` loop). On a TPU host a frozen interpreter
buys nothing — jax/libtpu must come from the host environment anyway —
so the analogue is a relocatable zip carrying exactly what a deployment
needs beyond that environment:

  qwen3_asr_gguf_tpu/        package source (as the reference ships its core)
  native/libqwen3asr_host.so prebuilt host codecs (+ C++ sources to rebuild)
  bin/transcribe, bin/serve  launcher shims (console-script analogues)
  start_server.sh, examples/, docs, pyproject.toml
  RELEASE.json               version / git revision / build stamp

Usage:
  python -m qwen3_asr_gguf_tpu.cli.release --out dist/
  unzip qwen3-asr-gguf-tpu-<ver>.zip && cd qwen3-asr-gguf-tpu-<ver>
  ./bin/transcribe audio.wav --model-dir model/
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
import zipfile
from pathlib import Path

_PKG_ROOT = Path(__file__).resolve().parent.parent  # qwen3_asr_gguf_tpu/
_REPO = _PKG_ROOT.parent

_LAUNCHER = """#!/bin/sh
# launcher shim: run the bundled package with the host python/jax
HERE="$(cd "$(dirname "$0")/.." && pwd)"
PYTHONPATH="$HERE${{PYTHONPATH:+:$PYTHONPATH}}" exec {python} -m {module} "$@"
"""


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=str(_REPO),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _version() -> str:
    try:
        import tomllib

        with open(_REPO / "pyproject.toml", "rb") as f:
            return tomllib.load(f)["project"]["version"]
    except Exception:
        return "0.0.0"


def _copy_pkg(dst: Path) -> None:
    shutil.copytree(
        _PKG_ROOT, dst / _PKG_ROOT.name,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", ".*"),
    )


def build_release(out_dir: Path, *, with_native: bool = True) -> Path:
    """Assemble the release tree and zip it; returns the zip path."""
    ver = _version()
    name = f"qwen3-asr-gguf-tpu-{ver}"
    stage = out_dir / name
    if stage.exists():
        shutil.rmtree(stage)
    stage.mkdir(parents=True)

    _copy_pkg(stage)

    # native host codecs: ship the built .so at the path native.load()
    # searches relative to the package, plus the sources so a different
    # host/glibc can `python -m qwen3_asr_gguf_tpu.native build` in place
    native_src = _REPO / "native"
    if native_src.is_dir():
        shutil.copytree(
            native_src / "src", stage / "native" / "src",
            ignore=shutil.ignore_patterns("__pycache__"),
        )
        shutil.copy2(native_src / "CMakeLists.txt", stage / "native" / "CMakeLists.txt")
        if with_native:
            from .. import native as native_mod

            if not native_mod.available():
                try:
                    native_mod.build(verbose=False)
                except Exception as e:  # source-only bundle still works
                    print(f"native build skipped ({e!r}); bundling sources only",
                          file=sys.stderr)
            for so in (native_src / "build" / "libqwen3asr_host.so",
                       native_src / "libqwen3asr_host.so"):
                if so.exists():
                    shutil.copy2(so, stage / "native" / so.name)
                    break

    # launcher shims (the frozen-CLI analogue; console-script names kept)
    bindir = stage / "bin"
    bindir.mkdir()
    for shim, module in (
        ("transcribe", "qwen3_asr_gguf_tpu.cli.transcribe"),
        ("serve", "qwen3_asr_gguf_tpu.cli.serve"),
        ("quant-accuracy", "qwen3_asr_gguf_tpu.cli.quant_accuracy"),
        ("export", "qwen3_asr_gguf_tpu.export"),
    ):
        p = bindir / shim
        p.write_text(_LAUNCHER.format(python="python3", module=module))
        p.chmod(0o755)

    for extra in ("README.md", "pyproject.toml", "start_server.sh"):
        src = _REPO / extra
        if src.exists():
            shutil.copy2(src, stage / extra)
    if (_REPO / "examples").is_dir():
        shutil.copytree(
            _REPO / "examples", stage / "examples",
            ignore=shutil.ignore_patterns("__pycache__"),
        )

    (stage / "RELEASE.json").write_text(json.dumps({
        "name": "qwen3-asr-gguf-tpu",
        "version": ver,
        "git_rev": _git_rev(),
        "built": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "python": f"{sys.version_info.major}.{sys.version_info.minor}",
        "native_bundled": any((stage / "native").glob("*.so"))
        or (stage / "native" / "build").exists(),
    }, indent=2) + "\n")

    zip_path = out_dir / f"{name}.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(stage.rglob("*")):
            if p.is_file():
                zf.write(p, p.relative_to(out_dir))
    return zip_path


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default="dist", help="output directory")
    ap.add_argument("--no-native", action="store_true",
                    help="skip building/bundling the native codec library")
    args = ap.parse_args(argv)
    zip_path = build_release(Path(args.out), with_native=not args.no_native)
    print(zip_path)


if __name__ == "__main__":
    main()
