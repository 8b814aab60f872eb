#!/usr/bin/env bash
# OpenAI-compatible server launcher (reference start_server.sh analogue).
set -euo pipefail
MODEL_DIR="${MODEL_DIR:-model}"
PORT="${PORT:-8000}"
exec python -m qwen3_asr_gguf_tpu.cli.serve --model-dir "$MODEL_DIR" --port "$PORT" "$@"
