"""Minimal engine usage (reference 21-Run-ASR.py:19-65 analogue).

    python examples/run_asr.py model/ audio.wav [Chinese]
"""

import sys

from qwen3_asr_gguf_tpu import ASREngineConfig, QwenASREngine


def main() -> None:
    model_dir, audio = sys.argv[1], sys.argv[2]
    language = sys.argv[3] if len(sys.argv) > 3 else None

    engine = QwenASREngine(ASREngineConfig(model_dir=model_dir))
    result = engine.transcribe(
        audio,
        language=language,
        context="",           # optional domain-biasing system prompt
        start_second=0.0,
        duration=0.0,          # 0 = whole file
        temperature=0.4,
        rollback_num=5,
    )
    print("\n--- transcript ---")
    print(result.text)
    print("--- performance ---")
    for k, v in (result.performance or {}).items():
        print(f"  {k}: {v}")
    engine.shutdown()


if __name__ == "__main__":
    main()
