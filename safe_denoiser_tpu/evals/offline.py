"""Offline metric orchestrators (reference evaluations/fid.py:18-221 and the
entry scripts evaluate_coco30k_fid_clip.py / evaluate_copro_aes_clip.py).

Feature extraction runs batched/jitted on the accelerator; the O(D³) sqrtm
for FID runs on host (evals/metrics.py). Results are written as YAML next to
the sample dir, matching the reference's metrics_*.yaml outputs
(evaluations/fid.py:62-67,118-124).
"""

from __future__ import annotations

import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .metrics import frechet_distance, kid_from_features, stats_from_features


def list_images(root: str) -> list[str]:
    out: list[str] = []
    for ext in ("png", "jpg", "jpeg"):
        out += glob(os.path.join(root, f"*.{ext}"))
    return sorted(out)


def load_image(path: str, size: int | None = None) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


class InceptionFeatures:
    """Batched pool3/logits extraction with the Flax InceptionV3."""

    def __init__(self, weights_path: str | None = None, batch_size: int = 32,
                 allow_random_init: bool = False):
        from .inception import InceptionV3, convert_inception
        self.model = InceptionV3()
        if weights_path is not None:
            from ..models.weights import load_state_dict
            self.params = convert_inception(load_state_dict(weights_path))
        elif allow_random_init:
            # plumbing-test mode only — features are meaningless for scoring
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
        else:
            raise ValueError(
                "InceptionFeatures needs the pt_inception-2015-12-05 weights "
                "(weights_path) for valid FID/KID/IS numbers; pass "
                "allow_random_init=True only for plumbing tests")
        self.batch_size = batch_size
        # device-resident params as jit ARGUMENTS (numpy closure constants
        # re-serialize into every compile; the HTTP-413 rule)
        self.params = jax.tree_util.tree_map(jax.device_put, self.params)
        _fwd = jax.jit(lambda p, px: self.model.apply(p, px))
        self._fwd = lambda px: _fwd(self.params, px)

    def __call__(self, paths: list[str]) -> tuple[np.ndarray, np.ndarray]:
        feats, logits = [], []
        bs = self.batch_size
        for i in range(0, len(paths), bs):
            batch = np.stack([load_image(p, 299) for p in paths[i:i + bs]])
            f, l = self._fwd(jnp.asarray(batch))
            feats.append(np.asarray(f))
            logits.append(np.asarray(l))
        return np.concatenate(feats), np.concatenate(logits)


def evaluate_fid(sample_dir: str, dataset_root: str,
                 inception_weights: str | None = None,
                 save_yaml: bool = True,
                 tag: str = "org_coco30k_10k",
                 allow_random_init: bool = False) -> dict:
    """FID + KID between sample_dir and dataset_root images
    (reference evaluations/fid.py:18-67)."""
    extractor = InceptionFeatures(inception_weights,
                                  allow_random_init=allow_random_init)
    sample_feats, _ = extractor(list_images(sample_dir))
    ref_feats, _ = extractor(list_images(dataset_root))

    mu1, s1 = stats_from_features(sample_feats)
    mu2, s2 = stats_from_features(ref_feats)
    fid = frechet_distance(mu1, s1, mu2, s2)
    kid_mean, kid_std = kid_from_features(ref_feats, sample_feats)
    result = {"fid": float(fid), "kid": float(kid_mean),
              "log_kid": float(np.log(max(kid_mean, 1e-12)))}
    if save_yaml:
        out = os.path.join(os.path.dirname(sample_dir.rstrip("/")),
                           f"metrics_{tag}.yaml")
        with open(out, "w") as f:
            yaml.dump(result, f)
    return result


def evaluate_clip_score(sample_dir: str, prompts_csv: str,
                        clip_weights_dir: str,
                        id_column: str = "coco_id",
                        prompt_column: str = "prompt",
                        save_yaml: bool = True) -> dict:
    """CLIPScore of generated images vs their prompts, matched by filename →
    id (reference evaluations/fid.py:75-124, base_image.py:144-157)."""
    import pandas as pd

    from ..runners.coco30k import InLoopClipScore

    scorer = InLoopClipScore(clip_weights_dir)
    df = pd.read_csv(prompts_csv)
    by_id = {str(row[id_column]): str(row[prompt_column])
             for _, row in df.iterrows()}

    scores = []
    for path in list_images(sample_dir):
        key = os.path.splitext(os.path.basename(path))[0].split("_")[0]
        if key not in by_id:
            continue
        img = (load_image(path) * 255).astype(np.uint8)
        scores.append(scorer(img, by_id[key]))
    result = {"clip_score": float(np.mean(scores)), "n": len(scores)}
    if save_yaml:
        out = os.path.join(os.path.dirname(sample_dir.rstrip("/")),
                           "metrics_clip_score.yaml")
        with open(out, "w") as f:
            yaml.dump(result, f)
    return result


def evaluate_image_similarity(sample_dir: str, ref_dir: str,
                              clip_vision_weights: str,
                              tower: str = "vit_h_14",
                              openclip_layout: bool = True,
                              save_yaml: bool = True) -> dict:
    """Image↔image CLIP cosine similarity, matched by filename stem — the
    reference's `coco_open_clip` in-loop mode (run_coco30k.py:172-215,
    ViT-H-14 laion2b)."""
    from ..models import (
        CLIP_VISION_VIT_B_32, CLIP_VISION_VIT_H_14, CLIP_VISION_VIT_L_14,
        CLIPVisionModel, preprocess_clip)
    from ..models.weights import (
        convert_clip_vision, convert_open_clip_vision, load_state_dict)

    cfg = {"vit_h_14": CLIP_VISION_VIT_H_14, "vit_l_14": CLIP_VISION_VIT_L_14,
           "vit_b_32": CLIP_VISION_VIT_B_32}[tower]
    sd = load_state_dict(clip_vision_weights)
    conv = convert_open_clip_vision if openclip_layout else convert_clip_vision
    params = conv(sd, cfg)
    model = CLIPVisionModel(cfg)
    embed = jax.jit(lambda px: model.apply(params, px)[2])

    def emb(path):
        e = np.asarray(embed(preprocess_clip(
            jnp.asarray(load_image(path)[None]), size=cfg.image_size)))[0]
        return e / np.linalg.norm(e)

    refs = {os.path.splitext(os.path.basename(p))[0].split("_")[0]: p
            for p in list_images(ref_dir)}
    ref_embs: dict[str, np.ndarray] = {}
    sims = []
    for path in list_images(sample_dir):
        key = os.path.splitext(os.path.basename(path))[0].split("_")[0]
        if key in refs:
            if key not in ref_embs:
                ref_embs[key] = emb(refs[key])
            sims.append(float(emb(path) @ ref_embs[key]))
    result = {"image_clip_similarity": float(np.mean(sims)), "n": len(sims)}
    if save_yaml:
        out = os.path.join(os.path.dirname(sample_dir.rstrip("/")),
                           "metrics_img_sim.yaml")
        with open(out, "w") as f:
            yaml.dump(result, f)
    return result


def style_gram_embedding(hidden_states: jnp.ndarray) -> jnp.ndarray:
    """Gram matrix of CLIP vision patch features — the style signature of
    reference evaluations/networks/style_CLIP.py:8 (used for artist-style
    similarity). hidden_states: [B, S, D] → [B, D, D] normalized grams."""
    h = hidden_states.astype(jnp.float32)
    gram = jnp.einsum("bsd,bse->bde", h, h) / h.shape[1]
    return gram


def evaluate_style_score(sample_dir: str, target_paths: list[str],
                         clip_vision_weights: str,
                         save_yaml: bool = True) -> dict:
    """Mean negative gram-distance of samples to target style images
    (reference evaluations/base_image.py:165-179 semantics: -||G_s - G_t||/10)."""
    from ..models import CLIP_VISION_VIT_B_32, CLIPVisionModel, preprocess_clip
    from ..models.weights import convert_clip_vision, load_state_dict

    vision = CLIPVisionModel(CLIP_VISION_VIT_B_32)
    vparams = convert_clip_vision(load_state_dict(clip_vision_weights),
                                  CLIP_VISION_VIT_B_32)
    hidden = jax.jit(lambda px: vision.apply(vparams, px)[0])

    def gram_of(path):
        img = load_image(path)
        return np.asarray(style_gram_embedding(
            hidden(preprocess_clip(jnp.asarray(img[None])))))[0]

    targets = [gram_of(p) for p in target_paths]
    sims = []
    for path in list_images(sample_dir):
        g = gram_of(path)
        for t in targets:
            diff = (g - t).reshape(-1)
            sims.append(-float(np.sqrt((diff ** 2).sum())) / 10.0)
    result = {"style_score": float(np.mean(sims)), "n": len(sims)}
    if save_yaml:
        out = os.path.join(os.path.dirname(sample_dir.rstrip("/")),
                           "metrics_style.yaml")
        with open(out, "w") as f:
            yaml.dump(result, f)
    return result


def evaluate_inception_score(sample_dir: str,
                             inception_weights: str | None = None,
                             save_yaml: bool = True,
                             allow_random_init: bool = False) -> dict:
    """IS over generated samples (reference evaluations/utils/inception_score.py)."""
    from .metrics import inception_score_from_logits

    extractor = InceptionFeatures(inception_weights,
                                  allow_random_init=allow_random_init)
    _, logits = extractor(list_images(sample_dir))
    mean, std = inception_score_from_logits(logits)
    result = {"inception_score": mean, "inception_score_std": std}
    if save_yaml:
        out = os.path.join(os.path.dirname(sample_dir.rstrip("/")),
                           "metrics_is.yaml")
        with open(out, "w") as f:
            yaml.dump(result, f)
    return result


def evaluate_aes_score(sample_dir: str, aes_weights: str,
                       clip_vision_weights: str,
                       save_yaml: bool = True) -> dict:
    """AES aesthetic score over generated images
    (reference evaluations/utils/aes.py + evaluate_copro_aes_clip.py:23-28)."""
    from ..models import CLIP_VISION_VIT_L_14, CLIPVisionModel, preprocess_clip
    from ..models.weights import convert_clip_vision, load_state_dict
    from .clip_metrics import aes_score, convert_aes_mlp

    vision = CLIPVisionModel(CLIP_VISION_VIT_L_14)
    vparams = convert_clip_vision(load_state_dict(clip_vision_weights),
                                  CLIP_VISION_VIT_L_14)
    aes_params = convert_aes_mlp(load_state_dict(aes_weights))
    embed = jax.jit(lambda px: vision.apply(vparams, px)[2])

    scores = []
    for path in list_images(sample_dir):
        img = load_image(path)
        emb = embed(preprocess_clip(jnp.asarray(img[None])))
        scores.append(float(np.asarray(aes_score(aes_params, emb))[0]))
    result = {"aes_score": float(np.mean(scores)), "n": len(scores)}
    if save_yaml:
        out = os.path.join(os.path.dirname(sample_dir.rstrip("/")),
                           "metrics_aes.yaml")
        with open(out, "w") as f:
            yaml.dump(result, f)
    return result
