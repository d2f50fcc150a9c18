import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_denoiser_tpu.ops.repellency_kernels import (
    rbf_negative_score_pallas,
    rbf_negative_score_ref,
    sparse_repellency_force,
)
from safe_denoiser_tpu.repellency import (
    RepellencyConfig,
    apply_repellency,
    get_repellency_method,
)
from safe_denoiser_tpu.schedulers import DDPMScheduler

torch = pytest.importorskip("torch")


def _torch_kernel_fast(x, refs, sigma, eps):
    """The reference's exact math (repellency_methods_threshold.py:309-349):
    cdist -> exp -> broadcast-product with [refs|ones] -> ratio."""
    xt = torch.tensor(np.asarray(x), dtype=torch.float32)
    rt = torch.tensor(np.asarray(refs), dtype=torch.float32)
    n, d = xt.shape
    m = rt.shape[0]
    kernel = -(torch.cdist(xt[None], rt[None])[0]).reshape(n, m, 1).repeat(1, 1, d + 1) / (2.0 * sigma ** 2)
    ones = torch.ones(m, 1)
    kernel = (kernel.exp() * torch.cat((rt, ones), dim=1).reshape(1, m, d + 1)).sum(dim=1)
    denominator = kernel[:, -1].reshape(-1, 1) + eps
    nominator = kernel[:, :-1]
    return (nominator / denominator).numpy(), denominator[:, 0].numpy()


def test_rbf_score_matches_reference_math():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4 * 8 * 8).astype(np.float32)
    refs = rng.randn(37, 4 * 8 * 8).astype(np.float32)
    sigma, eps = 3.15, 1e-8
    want_score, want_beta = _torch_kernel_fast(x, refs, sigma, eps)
    score, beta = rbf_negative_score_ref(jnp.asarray(x), jnp.asarray(refs), sigma, eps)
    np.testing.assert_allclose(np.asarray(score), want_score, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(beta), want_beta, rtol=2e-4)


def test_pallas_kernel_matches_ref_interpret():
    # CPU: run the Pallas kernel in interpreter mode vs the jnp reference.
    rng = np.random.RandomState(1)
    x = rng.randn(2, 512).astype(np.float32)
    refs = rng.randn(77, 512).astype(np.float32)  # deliberately not tile-aligned
    s_ref, b_ref = rbf_negative_score_ref(jnp.asarray(x), jnp.asarray(refs), 2.5)
    s_pal, b_pal = rbf_negative_score_pallas(jnp.asarray(x), jnp.asarray(refs), 2.5,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_pal), np.asarray(b_ref), rtol=1e-5)


def test_sparse_force_matches_reference_math():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4 * 8 * 8).astype(np.float32)
    refs = (x + 0.5 * rng.randn(21, 4 * 8 * 8)).astype(np.float32)
    radius = float(np.median(np.linalg.norm(x - refs, axis=1))) + 0.1

    # reference (repellency_methods_threshold.py:415-439)
    xt = torch.tensor(x)
    rt = torch.tensor(refs)
    dist = torch.norm(xt - rt, p=2, dim=1)
    neigh = rt[dist < radius]
    diff = xt.unsqueeze(1) - neigh.unsqueeze(0)
    w = torch.norm(diff, p=2, dim=2)
    tw = torch.relu(radius / w - 1.0)
    want = (diff * tw[..., None]).sum(dim=1).numpy()

    force, c_sum = sparse_repellency_force(jnp.asarray(x), jnp.asarray(refs), radius)
    np.testing.assert_allclose(np.asarray(force), want, rtol=1e-4, atol=1e-5)
    assert float(c_sum[0]) > 0


def test_apply_repellency_beta_gate():
    rng = np.random.RandomState(3)
    refs = rng.randn(16, 4, 8, 8).astype(np.float32)
    x_near = refs[:1] + 0.01  # on top of the bank -> huge beta
    x_far = 100.0 + np.zeros((1, 4, 8, 8), np.float32)

    cfg = RepellencyConfig(method="kernel_fast", sigma=3.0, scale=0.33,
                           beta_threshold=1e-3, use_beta_gate=True)
    _, neg_near = apply_repellency(jnp.asarray(x_near), jnp.asarray(refs), cfg)
    _, neg_far = apply_repellency(jnp.asarray(x_far), jnp.asarray(refs), cfg)
    assert bool(neg_near[0]) is True
    assert bool(neg_far[0]) is False


def test_apply_repellency_moves_away_from_bank():
    rng = np.random.RandomState(4)
    refs = rng.randn(32, 4, 8, 8).astype(np.float32)
    refs = refs / np.linalg.norm(refs, axis=1, keepdims=True)
    x = refs[:1] * 1.0
    cfg = RepellencyConfig(method="kernel_fast", sigma=1.0, scale=0.5,
                           use_beta_gate=False)
    x_new, _ = apply_repellency(jnp.asarray(x), jnp.asarray(refs), cfg)
    d_before = np.linalg.norm(np.asarray(x).reshape(-1) - refs.reshape(32, -1), axis=1).min()
    d_after = np.linalg.norm(np.asarray(x_new).reshape(1, -1) - refs.reshape(32, -1), axis=1).min()
    assert d_after > d_before


def test_processor_calibration_and_cache(tmp_path):
    # end-to-end: images -> embed -> project -> beta calibration -> .pt caches
    rng = np.random.RandomState(5)
    ref_imgs = rng.randn(12, 3, 32, 32).astype(np.float32)
    embed = lambda x: jnp.asarray(x)[:, :1, ::4, ::4].repeat(4, axis=1) * 0.18215
    sched = DDPMScheduler()
    proj_path = str(tmp_path / "proj.pt")
    beta_path = str(tmp_path / "noisy.pt")

    proc = get_repellency_method(
        "kernel_fast", ref_data=ref_imgs, embed_fn=embed,
        num_timesteps=5, n_embed=4, scheduler=sched,
        sigma=3.15, scale=0.33, beta_threshold=-1.0,
        proj_ref_path=proj_path, cache_proj_ref=False,
        proj_noisy_ref_path_for_beta=beta_path,
        cache_noisy_ref_path_for_beta=False,
    )
    assert proc.beta_threshold > 0
    assert proc.get_proj_ref().shape == (12, 4, 8, 8)
    # channel-normalized bank
    norms = np.linalg.norm(np.asarray(proc.get_proj_ref()), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)

    # caches written and reloadable by torch (the reference's loader)
    t1 = torch.load(proj_path, weights_only=False)
    assert tuple(t1.shape) == (12, 4, 8, 8)
    t2 = torch.load(beta_path, weights_only=False)
    assert len(t2) == 5

    # reload path (cache_proj_ref=True) must give the same bank
    proc2 = get_repellency_method(
        "kernel_fast", ref_data=ref_imgs, embed_fn=embed,
        num_timesteps=5, n_embed=4, scheduler=sched,
        sigma=3.15, beta_threshold=0.5,
        proj_ref_path=proj_path, cache_proj_ref=True,
    )
    np.testing.assert_allclose(np.asarray(proc2.get_proj_ref()),
                               np.asarray(proc.get_proj_ref()), rtol=1e-6)

    out = proc.conditioning(np.asarray(proc.get_proj_ref()[:1]), beta_threshold=True)
    assert "x_0_hat" in out and isinstance(out["is_negation"], bool)


def test_sparse_processor_radius_calibration(tmp_path):
    rng = np.random.RandomState(6)
    ref_imgs = rng.randn(8, 3, 16, 16).astype(np.float32)
    embed = lambda x: jnp.asarray(x)[:, :1, ::2, ::2].repeat(4, axis=1)
    proc = get_repellency_method(
        "sparse", ref_data=ref_imgs, embed_fn=embed,
        num_timesteps=3, n_embed=4, scheduler=DDPMScheduler(),
        radius=-1.0, scale=1.6, quantile=0.25,
    )
    assert proc.radius > 0
    out = proc.conditioning(np.asarray(proc.get_proj_ref()[:1]))
    assert out["is_negation"] is True


def test_lsh_repellency_buckets_and_conditioning():
    rng = np.random.RandomState(7)
    ref_imgs = rng.randn(20, 3, 16, 16).astype(np.float32)
    embed = lambda x: jnp.asarray(x)[:, :1, ::2, ::2].repeat(4, axis=1)
    proc = get_repellency_method(
        "lsh", ref_data=ref_imgs, embed_fn=embed, n_embed=8,
        sigma=5.0, scale=0.5, n_components=8, hash_size=4, num_hashtables=3)
    # query with a bank member: its own bucket is non-empty -> negation
    x = np.asarray(proc.get_proj_ref()[:2])
    out = proc.conditioning(x)
    assert out["is_negation"] is True
    assert out["x_0_hat"].shape == x.shape
    # the correction moves the point (bucket kernel applied)
    assert not np.allclose(out["x_0_hat"], x)


def test_lsh_batched_kernel_matches_loop_reference():
    """The vectorized padded-bucket kernel (repellency/lsh.py::_bucket_scores)
    == a per-sample numpy re-typing of the reference lsh math
    (repellency_methods_fast.py:342-433: squared-distance RBF over the
    bucket, empty bucket → passthrough)."""
    import jax.numpy as jnp

    from safe_denoiser_tpu.repellency.lsh import _bucket_scores

    rs = np.random.RandomState(3)
    n, m, d, sigma, scale, eps = 5, 7, 12, 2.0, 0.4, 1e-8
    flat = rs.randn(n, d).astype(np.float32)
    refs = rs.randn(m, d).astype(np.float32)
    buckets = [[0, 3, 5], [], [2], [1, 2, 3, 4, 6], [6]]

    k = 8
    idx = np.zeros((n, k), np.int32)
    mask = np.zeros((n, k), np.float32)
    for i, b in enumerate(buckets):
        idx[i, :len(b)] = b
        mask[i, :len(b)] = 1.0
    got = np.asarray(_bucket_scores(
        jnp.asarray(flat), jnp.asarray(refs), jnp.asarray(idx),
        jnp.asarray(mask), sigma=sigma, scale=scale, epsilon=eps))

    want = flat.copy()
    for i, b in enumerate(buckets):
        if not b:
            continue
        mem = refs[b]
        d2 = ((flat[i][None] - mem) ** 2).sum(-1)
        w = np.exp(-d2 / (2 * sigma ** 2))
        score = (w @ mem) / (w.sum() + eps)
        want[i] = flat[i] - scale * score
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
