"""LSH-bucketed approximate repellency (the reference's experimental ``lsh``
method: repellency_methods_fast.py:342-433 + repellency/utils/lshash_torch.py).

Random-projection LSH over PCA-reduced latents: bucket the negative bank
once at setup, then at query time hash x̂₀, gather its bucket, and run the
RBF negative-denoiser on just those members.

TPU-first split: hashing/bucketing is host-side numpy (one-time setup +
per-call code computation is trivial); the kernel math on the gathered
bucket reuses the fused rbf path. The data-dependent bucket size makes this
method host-dispatched rather than scan-resident — matching its role in the
reference as an ablation, not the production path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .methods import RepellencyProcessor, register_conditioning_method


@functools.partial(jax.jit, static_argnames=("sigma", "scale", "epsilon"))
def _bucket_scores(flat_x, refs, idx, mask, *, sigma, scale, epsilon):
    """One batched bucket-local RBF negative-denoiser step.

    ``idx`` [N, K] gathers each sample's (padded) bucket members from the
    bank; ``mask`` [N, K] zeroes the padding — an all-padding row yields
    w≡0 → score 0 → the sample passes through unchanged, exactly the
    reference's empty-bucket ``continue``. Squared distance in the RBF
    exponent (reference repellency_methods_fast.py:415: cdist(...)**2,
    unlike kernel_fast's plain distance).
    """
    members = refs[idx]                                    # [N, K, D]
    d2 = jnp.sum(jnp.square(flat_x[:, None, :] - members), axis=-1)
    w = jnp.exp(-d2 / (2.0 * sigma ** 2)) * mask           # [N, K]
    score = jnp.einsum("nk,nkd->nd", w, members) / (
        jnp.sum(w, axis=-1, keepdims=True) + epsilon)
    return flat_x - scale * score


class LSHash:
    """Multi-table random-projection LSH (lshash_torch.py:39-343 semantics:
    sign-bit hashing of uniform(-1,1) planes, per-table dict buckets)."""

    def __init__(self, hash_size: int, input_dim: int, num_hashtables: int = 1,
                 seed: int = 0):
        rng = np.random.RandomState(seed)
        self.planes = [rng.uniform(-1, 1, (hash_size, input_dim))
                       for _ in range(num_hashtables)]
        self.tables: list[dict[str, list[int]]] = [
            {} for _ in range(num_hashtables)]

    def _hash(self, plane: np.ndarray, point: np.ndarray) -> str:
        bits = (plane @ point.reshape(-1)) > 0
        return "".join("1" if b else "0" for b in bits)

    def index(self, point: np.ndarray, extra_data: int) -> None:
        for plane, table in zip(self.planes, self.tables):
            table.setdefault(self._hash(plane, point), []).append(extra_data)

    def query(self, point: np.ndarray) -> list[int]:
        out: list[int] = []
        seen = set()
        for plane, table in zip(self.planes, self.tables):
            for idx in table.get(self._hash(plane, point), []):
                if idx not in seen:
                    seen.add(idx)
                    out.append(idx)
        return out


@register_conditioning_method(name="lsh")
class LSHRepellency(RepellencyProcessor):
    """PCA → LSH bucketing → bucket-local kernel_fast."""

    method_name = "lsh"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.n_components = int(kwargs.get("n_components", 32))
        self.hash_size = int(kwargs.get("hash_size", 8))
        self.num_hashtables = int(kwargs.get("num_hashtables", 4))

        refs = np.asarray(self.proj_refs, dtype=np.float32)
        flat = refs.reshape(refs.shape[0], -1)
        from sklearn.decomposition import PCA
        self.pca = PCA(n_components=min(self.n_components, *flat.shape))
        reduced = self.pca.fit_transform(flat)
        self.lsh = LSHash(self.hash_size, reduced.shape[1],
                          self.num_hashtables)
        for i, p in enumerate(reduced):
            self.lsh.index(p, i)
        # device-resident ONCE: a numpy arg to the jitted _bucket_scores
        # re-uploads per call (the ~100x pipeline transfer bug class fixed
        # in e300b73) — with a real 3k-image bank that would ship hundreds
        # of MB per diffusion step through the ~1 MB/s tunnel (ADVICE r4)
        self._flat_refs = jax.device_put(jnp.asarray(flat))

    def conditioning(self, x_0_hat, **kwargs):
        """Batched: host-side LSH queries (microseconds) build ONE padded
        [N, K] bucket-index matrix, then a single jitted gather + RBF pass
        handles the whole batch — no per-sample Python loop, no per-bucket
        device round-trips (the round-3 form dispatched one jax call per
        non-empty bucket; VERDICT r3 next #8). K pads to the next power of
        two so recompiles are bounded at log2(M) distinct programs."""
        x = np.asarray(x_0_hat, dtype=np.float32)
        n = x.shape[0]
        flat = x.reshape(n, -1)
        reduced = self.pca.transform(flat)

        buckets = [self.lsh.query(reduced[i]) for i in range(n)]
        any_neg = any(buckets)
        if not any_neg:
            return {"x_0_hat": x, "is_negation": False,
                    "mean_x_0_hat": None}
        k = max(1, 1 << (max(len(b) for b in buckets) - 1).bit_length())
        idx = np.zeros((n, k), dtype=np.int32)
        mask = np.zeros((n, k), dtype=np.float32)
        for i, b in enumerate(buckets):
            idx[i, :len(b)] = b
            mask[i, :len(b)] = 1.0
        out = _bucket_scores(
            jnp.asarray(flat), self._flat_refs,
            jnp.asarray(idx), jnp.asarray(mask),
            sigma=float(self.sigma), scale=float(self.scale),
            epsilon=float(self.epsilon))
        return {"x_0_hat": np.asarray(out).reshape(x.shape),
                "is_negation": any_neg, "mean_x_0_hat": None}
