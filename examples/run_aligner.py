"""Minimal forced-aligner usage (reference 18-Run-Aligner.py:24-45 analogue).

    python examples/run_aligner.py model/ audio.wav "已知的转写文本" [Chinese]
"""

import sys

from qwen3_asr_gguf_tpu import AlignerConfig, QwenForcedAligner
from qwen3_asr_gguf_tpu.audio.io import load_audio


def main() -> None:
    model_dir, audio_path, text = sys.argv[1], sys.argv[2], sys.argv[3]
    language = sys.argv[4] if len(sys.argv) > 4 else "Chinese"

    aligner = QwenForcedAligner(AlignerConfig(model_dir=model_dir))
    audio = load_audio(audio_path)
    result = aligner.align(audio, text, language=language)

    for item in result.items:
        print(f"[{item.start_time:7.3f} - {item.end_time:7.3f}] {item.text}")
    print("--- performance ---", result.performance)


if __name__ == "__main__":
    main()
