"""Plain Qwen3 text-LLM conversion breadth (export.convert.convert_text_llm).

The reference covers generic HF->GGUF conversion by vendoring llama.cpp's
convert_hf_to_gguf.py (reference export/convert_hf_to_gguf.py); this
framework converts the architectures its decoder executes — the Qwen3 text
family — through the same writer the ASR path uses. Gate: a real (tiny)
Qwen3ForCausalLM torch checkpoint round-trips HF dir -> GGUF ->
load_decoder_gguf -> Generator with greedy tokens equal to the torch
oracle's, including the tie_word_embeddings layout that ships no lm_head
tensor.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.export.convert import convert_text_llm
from qwen3_asr_gguf_tpu.models import params as P
from qwen3_asr_gguf_tpu.runtime.generate import Generator

torch = pytest.importorskip("torch")


def _tiny_hf_checkpoint(tmp_path: Path, *, tie: bool) -> Path:
    from transformers.models.qwen3 import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=128,
        rope_theta=5_000_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
        attention_dropout=0.0,
    )
    torch.manual_seed(7 if tie else 8)
    model = Qwen3ForCausalLM(cfg).eval()
    d = tmp_path / ("hf_tied" if tie else "hf_untied")
    model.save_pretrained(str(d), safe_serialization=True)
    return d


def _torch_greedy(hf_dir: Path, prompt: list[int], n: int) -> list[int]:
    from transformers.models.qwen3 import Qwen3ForCausalLM

    model = Qwen3ForCausalLM.from_pretrained(str(hf_dir)).eval()
    ids = torch.tensor([prompt], dtype=torch.long)
    out = []
    with torch.no_grad():
        for _ in range(n):
            logits = model(ids).logits[0, -1]
            t = int(logits.argmax())
            out.append(t)
            ids = torch.cat([ids, torch.tensor([[t]], dtype=torch.long)], dim=1)
    return out


@pytest.mark.parametrize("tie", [True, False], ids=["tied-head", "untied-head"])
def test_qwen3_text_llm_greedy_parity(tmp_path, tie):
    hf_dir = _tiny_hf_checkpoint(tmp_path, tie=tie)
    # tied checkpoints must not ship an lm_head tensor — that's the layout
    # under test (converter falls back to the embedding table)
    from safetensors.numpy import load_file

    tensors = load_file(str(next(hf_dir.glob("*.safetensors"))))
    assert ("lm_head.weight" in tensors) == (not tie)

    out_gguf = tmp_path / "llm.f32.gguf"
    cfg = convert_text_llm(str(hf_dir), str(out_gguf), quant="f32")
    assert cfg.num_layers == 2 and cfg.vocab_size == 256

    import jax.numpy as jnp

    lcfg, params, _tok = P.load_decoder_gguf(str(out_gguf), precision="f32")
    assert lcfg.num_layers == cfg.num_layers and lcfg.head_dim == cfg.head_dim
    gen = Generator(params, lcfg, n_ctx=128, eos_ids=(255,),
                    cache_dtype=jnp.float32, bucket=16, block=8)

    prompt = [3, 17, 250, 42, 9]
    embd = np.asarray(params["embed"])[np.asarray(prompt)]
    state = gen.start(embd, temperature=0.0, seed=0)
    got, state, _ = gen.decode_block(state, temperature=0.0)

    want = _torch_greedy(hf_dir, prompt, len(got) + 1)
    want = [t for t in want[: len(got)] if t != 255]
    assert got[: len(want)] == want and len(want) >= 6


def test_non_qwen3_arch_refused(tmp_path):
    d = tmp_path / "llama"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"architectures": ["LlamaForCausalLM"]}))
    with pytest.raises(ValueError, match="unsupported text-LLM architecture"):
        convert_text_llm(str(d), str(tmp_path / "x.gguf"))
