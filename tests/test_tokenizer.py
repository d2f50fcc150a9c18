"""CLIP BPE tokenizer golden test vs. HF transformers CLIPTokenizer,
using a synthetic vocab/merges pair written to disk (no downloads)."""

import json
import os

import pytest

transformers = pytest.importorskip("transformers")

from safe_denoiser_tpu.text import CLIPTokenizer
from safe_denoiser_tpu.text.clip_tokenizer import bytes_to_unicode


def _build_tiny_vocab(tmp_path):
    chars = list(bytes_to_unicode().values())
    tokens = chars + [c + "</w>" for c in chars]
    merges = [("c", "a"), ("t", "</w>"), ("ca", "t</w>"), ("d", "o"),
              ("do", "g</w>"), ("r", "u"), ("ru", "n"), ("n", "s</w>"),
              ("run", "s</w>"), ("'", "s</w>")]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges) + "\n")
    return vocab, merges


@pytest.mark.parametrize("text", [
    "a cat", "The DOG runs", "cat dog cat", "a cat's dog!",
    "weird   spacing\tand&amp;entities", "",
])
def test_matches_hf_clip_tokenizer(tmp_path, text):
    _build_tiny_vocab(tmp_path)
    hf = transformers.CLIPTokenizer(
        vocab_file=str(tmp_path / "vocab.json"),
        merges_file=str(tmp_path / "merges.txt"),
        model_max_length=16)
    mine = CLIPTokenizer.from_pretrained(str(tmp_path), max_length=16)

    want = hf(text, padding="max_length", max_length=16, truncation=True)
    got = mine(text, padding="max_length", max_length=16, truncation=True)
    assert got["input_ids"][0] == want["input_ids"]
    assert got["attention_mask"][0] == want["attention_mask"]


def test_truncation_ends_with_eos(tmp_path):
    _build_tiny_vocab(tmp_path)
    mine = CLIPTokenizer.from_pretrained(str(tmp_path), max_length=6)
    out = mine("cat dog cat dog cat dog cat dog")
    ids = out["input_ids"][0]
    assert len(ids) == 6
    assert ids[0] == mine.bos_token_id
    assert ids[-1] == mine.eos_token_id
