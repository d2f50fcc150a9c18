"""ctypes binding for the native C++ BPE engine (native/bpe_tokenizer.cpp).

Builds the shared library on demand with g++ (cached next to the source);
falls back cleanly when no compiler/engine is available — the Python
implementation in clip_tokenizer.py is the reference semantics either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "bpe_tokenizer.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libsdtbpe.so")


def _ensure_built() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


class NativeBPE:
    """Native encode() with the same id stream as CLIPTokenizer.encode."""

    def __init__(self, vocab: dict[str, int], merges):
        lib_path = _ensure_built()
        if lib_path is None:
            raise RuntimeError("native BPE engine unavailable (no g++?)")
        self._lib = ctypes.CDLL(lib_path)
        self._lib.sdt_bpe_create.restype = ctypes.c_void_p
        self._lib.sdt_bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        self._lib.sdt_bpe_encode.restype = ctypes.c_int32
        self._lib.sdt_bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        self._lib.sdt_bpe_destroy.argtypes = [ctypes.c_void_p]

        # The engine assigns line-index ids; remap to the true (possibly
        # non-dense) vocab ids on the way out.
        by_id = sorted(vocab.items(), key=lambda kv: kv[1])
        self._remap = [tid for _, tid in by_id]
        vocab_blob = "\n".join(tok for tok, _ in by_id).encode("utf-8")
        merges_blob = "\n".join(f"{a} {b}" for a, b in merges).encode("utf-8")
        self._handle = self._lib.sdt_bpe_create(vocab_blob, merges_blob)

    def encode(self, text: str, max_out: int = 4096) -> list[int]:
        buf = (ctypes.c_int32 * max_out)()
        n = self._lib.sdt_bpe_encode(self._handle, text.encode("utf-8"),
                                     buf, max_out)
        return [self._remap[i] for i in buf[:n]]

    def __del__(self):
        try:
            self._lib.sdt_bpe_destroy(self._handle)
        except Exception:
            pass
