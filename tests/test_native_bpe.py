"""Native C++ BPE engine vs. the Python CLIPTokenizer (same id streams)."""

import shutil

import pytest

from safe_denoiser_tpu.text import CLIPTokenizer
from safe_denoiser_tpu.text.clip_tokenizer import bytes_to_unicode

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _tok():
    chars = list(bytes_to_unicode().values())
    tokens = chars + [c + "</w>" for c in chars]
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"),
              ("t", "h"), ("th", "e</w>"), ("r", "u"), ("ru", "n"),
              ("'", "s</w>")]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    return CLIPTokenizer(merges, vocab, max_length=32)


@pytest.mark.parametrize("text", [
    "a cat", "The DOG runs to the cat", "cat's dog!", "weird   spacing\tand",
    "punct!!! ...--- cat", "123 cats 456", "", "naïve café prompt",
    "mixed CASE The THE the",
])
def test_native_matches_python(text):
    from safe_denoiser_tpu.text.native import NativeBPE

    tok = _tok()
    merges = sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
    native = NativeBPE(tok.vocab, merges)
    assert native.encode(text) == tok.encode(text), text


def test_native_throughput_smoke():
    from safe_denoiser_tpu.text.native import NativeBPE

    tok = _tok()
    merges = sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
    native = NativeBPE(tok.vocab, merges)
    prompts = [f"the cat runs to the dog {i}" for i in range(500)]
    out = [native.encode(p) for p in prompts]
    assert len(out) == 500 and all(len(o) > 0 for o in out)
