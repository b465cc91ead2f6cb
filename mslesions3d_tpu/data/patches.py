"""Device-side random patch sampling for full-resolution training.

The reference trains on whole volumes resized/cropped to a fixed shape
(lesions3d/datasets.py:206 ResizeWithPadOrCropd) — at (250,300,300) that
either downsamples away small lesions or does not fit training memory.
The standard alternative (nnU-Net-style) is to train on random patches of
the full-resolution volume with lesion-biased sampling. SURVEY.md names
"device-side ... patch sampling" as a TPU-native kernel obligation (§2,
native-component statement); this module is that component, built the XLA
way rather than as a host dataloader:

* the datamodule ships FULL volumes to the device (or keeps them in the
  HBM data cache); each train step draws a fresh patch per sample with
  ``jax.random`` + ``dynamic_slice`` INSIDE the jitted step — zero host
  work, new crops every epoch for free;
* sampling is lesion-biased: with probability ``pos_fraction`` the patch
  is centered on a (uniformly chosen) ground-truth box with random jitter
  that keeps the box inside, otherwise the offset is uniform — the usual
  fix for extreme foreground/background imbalance in lesion volumes;
* boxes re-map to patch-fractional coordinates on device; boxes whose
  CENTER falls outside the patch are masked out (SSD matching convention),
  the rest are clipped to the patch.

Composes with sliding-window inference (sliding_window.py) for the
train-on-patches / predict-full-volume pipeline, and with the data mesh
(batches of full volumes shard on "data" like any other batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_patch_starts(rng, vol_shape, patch, boxes, box_mask,
                        pos_fraction: float = 0.7):
    """Per-sample random patch start voxels (B, 3), lesion-biased.

    ``boxes`` (B, M, 6) fractional corner form over the FULL volume,
    ``box_mask`` (B, M). With probability ``pos_fraction`` (and at least one
    real box) the start is drawn uniformly from the range of starts whose
    patch CONTAINS the chosen box's center; otherwise uniform over the
    volume. All shapes static; runs under jit/vmap.
    """
    vol = jnp.asarray(vol_shape, jnp.float32)
    pat = jnp.asarray(patch, jnp.float32)
    max_start = vol - pat  # >= 0 enforced by the caller

    def one(key, bxs, msk):
        k_pos, k_idx, k_jit, k_uni = jax.random.split(key, 4)
        n_real = msk.sum()
        # uniform index over REAL boxes (masked ones get probability 0)
        probs = jnp.where(msk, 1.0, 0.0)
        probs = probs / jnp.maximum(probs.sum(), 1.0)
        idx = jax.random.choice(k_idx, msk.shape[0], p=probs)
        center = (bxs[idx, :3] + bxs[idx, 3:]) * 0.5 * vol  # voxels
        # starts for which the center lies strictly inside the patch
        lo = jnp.clip(center - pat + 1.0, 0.0, max_start)
        hi = jnp.clip(center, 0.0, max_start)
        jit = jax.random.uniform(k_jit, (3,))
        pos_start = lo + jit * jnp.maximum(hi - lo, 0.0)
        uni_start = jax.random.uniform(k_uni, (3,)) * max_start
        take_pos = (jax.random.uniform(k_pos) < pos_fraction) & (n_real > 0)
        start = jnp.where(take_pos, pos_start, uni_start)
        return jnp.floor(start).astype(jnp.int32)

    keys = jax.random.split(rng, boxes.shape[0])
    return jax.vmap(one)(keys, boxes, box_mask)


def deterministic_patch_starts(vol_shape, patch, boxes, box_mask):
    """Deterministic per-sample starts: patch centered on the mean of real
    box centers (volume center when a sample has none). Used for VALIDATION
    under patch training, so the monitored val loss is reproducible across
    epochs and runs (a random val crop would make checkpoint selection
    noisy)."""
    vol = jnp.asarray(vol_shape, jnp.float32)
    pat = jnp.asarray(patch, jnp.float32)
    max_start = vol - pat
    centers = (boxes[..., :3] + boxes[..., 3:]) * 0.5  # (B, M, 3) fractional
    w = box_mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
    mean_c = (centers * w[..., None]).sum(axis=1) / n  # (B, 3)
    mean_c = jnp.where(box_mask.any(axis=1, keepdims=True), mean_c, 0.5)
    start = jnp.clip(mean_c * vol - pat * 0.5, 0.0, max_start)
    return jnp.floor(start).astype(jnp.int32)


def crop_patches(volumes, starts, patch):
    """(B, D, H, W, C) full volumes -> (B, *patch, C) crops at ``starts``."""
    c = volumes.shape[-1]

    def one(vol, s):
        return jax.lax.dynamic_slice(vol, (s[0], s[1], s[2], 0), (*patch, c))

    return jax.vmap(one)(volumes, starts)


def boxes_to_patch(boxes, box_mask, starts, vol_shape, patch):
    """Re-map full-volume fractional boxes into patch-fractional coords.

    Returns (patch_boxes, patch_mask): boxes whose center lies inside the
    patch, translated/rescaled to the patch frame and clipped to [0, 1];
    everything else masked out (and zeroed, keeping padded slots inert).
    """
    vol = jnp.asarray(vol_shape, jnp.float32)
    pat = jnp.asarray(patch, jnp.float32)
    off = starts.astype(jnp.float32)[:, None, :]  # (B, 1, 3) voxels
    lo = (boxes[..., :3] * vol - off) / pat
    hi = (boxes[..., 3:] * vol - off) / pat
    center = (lo + hi) * 0.5
    inside = jnp.all((center >= 0.0) & (center < 1.0), axis=-1)
    new_mask = box_mask & inside
    out = jnp.clip(jnp.concatenate([lo, hi], axis=-1), 0.0, 1.0)
    # degenerate after clipping (box fully outside on some axis) -> masked
    degenerate = jnp.any(out[..., 3:] <= out[..., :3], axis=-1)
    new_mask = new_mask & ~degenerate
    return jnp.where(new_mask[..., None], out, 0.0), new_mask
