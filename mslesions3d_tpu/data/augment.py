"""Device-side random augmentation: box-aware flips, rot90, affine, intensity.

The reference augments on CPU inside DataLoader workers via MONAI random
transforms applied to image+segmentation BEFORE box derivation
(lesions3d/train.py:132-145, datasets.py:221-229). Here boxes are derived
once on the host and augmentation runs inside the jitted step on device,
transforming images and boxes jointly:

  * flip over any spatial axis          (RandFlipd parity)
  * rot90 in a plane of equal dims      (RandRotate90d parity)
  * affine scale about the center + voxel translation, trilinear resample
    (RandAffined translate/scale parity; boxes transform analytically —
    equivalent geometry to transforming the seg then re-deriving boxes)
  * intensity shift / scale             (RandShift/ScaleIntensityd parity)

All branches are lax.cond-free: transforms are applied unconditionally and
blended by the Bernoulli draw, keeping the program fully static for XLA.
Images are (D, H, W, C) single samples; batch via vmap with per-sample keys.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    flip_axes: tuple = ()  # e.g. (0, 1, 2)
    flip_prob: float = 0.5
    rot90_planes: tuple = ()  # e.g. ((1, 2), (0, 1), (0, 2))
    rot90_prob: float = 0.5
    affine_prob: float = 0.0  # reference "translate"/"scale" -> affine
    translate_range: float = 3.0  # voxels
    scale_range: float = 0.15
    shift_intensity: float = 0.0  # offsets
    shift_prob: float = 1.0
    scale_intensity: float = 0.0  # factors
    scale_prob: float = 1.0

    @staticmethod
    def from_names(names) -> "AugmentConfig":
        """Build from reference-style augmentation name lists (train.py:132-145)."""
        kwargs = {}
        names = set(names or ())
        if "flip" in names:
            kwargs["flip_axes"] = (0, 1, 2)
        if "rotate90" in names or "rotate90d" in names:
            kwargs["rot90_planes"] = ((1, 2), (0, 1), (0, 2))
        if "translate" in names or "scale" in names or "affine" in names:
            kwargs["affine_prob"] = 0.7
        if "shiftintensity" in names:
            kwargs["shift_intensity"] = 0.1
        if "scaleintensity" in names:
            kwargs["scale_intensity"] = 0.1
        return AugmentConfig(**kwargs)

    @property
    def identity(self) -> bool:
        return (
            not self.flip_axes
            and not self.rot90_planes
            and self.affine_prob == 0.0
            and self.shift_intensity == 0.0
            and self.scale_intensity == 0.0
        )


def _flip_boxes(boxes, axis, inv_size):
    """Corner-form fractional boxes under a flip of spatial ``axis``.

    GT boxes use the inclusive-max-index convention (box = [min_idx,
    max_idx] / size, utils.py:500): a flip maps index i -> S-1-i, so the new
    corner is 1 - old - 1/S, not 1 - old.
    """
    lo = boxes[..., axis]
    hi = boxes[..., axis + 3]
    boxes = boxes.at[..., axis].set(1.0 - hi - inv_size)
    return boxes.at[..., axis + 3].set(1.0 - lo - inv_size)


def _rot90_boxes(boxes, a, b, inv_size):
    """Boxes under jnp.rot90(img, 1, axes=(a, b)).

    out[i, j] = in[j, S-1-i]: new_a = 1 - old_b - 1/S (inclusive-index
    convention, see _flip_boxes), new_b = old_a.
    """
    lo_a, hi_a = boxes[..., a], boxes[..., a + 3]
    lo_b, hi_b = boxes[..., b], boxes[..., b + 3]
    boxes = boxes.at[..., a].set(1.0 - hi_b - inv_size)
    boxes = boxes.at[..., a + 3].set(1.0 - lo_b - inv_size)
    boxes = boxes.at[..., b].set(lo_a)
    return boxes.at[..., b + 3].set(hi_a)


def trilinear_resample(img, coords):
    """Sample (D,H,W,C) image at fractional voxel coords (D,H,W,3), edge-clamped."""
    d, h, w, _ = img.shape
    maxes = jnp.asarray([d - 1, h - 1, w - 1], jnp.float32)
    coords = jnp.clip(coords, 0.0, maxes)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, maxes.astype(jnp.int32))
    frac = coords - lo

    def gather(ix, iy, iz):
        return img[ix, iy, iz]

    c000 = gather(lo[..., 0], lo[..., 1], lo[..., 2])
    c001 = gather(lo[..., 0], lo[..., 1], hi[..., 2])
    c010 = gather(lo[..., 0], hi[..., 1], lo[..., 2])
    c011 = gather(lo[..., 0], hi[..., 1], hi[..., 2])
    c100 = gather(hi[..., 0], lo[..., 1], lo[..., 2])
    c101 = gather(hi[..., 0], lo[..., 1], hi[..., 2])
    c110 = gather(hi[..., 0], hi[..., 1], lo[..., 2])
    c111 = gather(hi[..., 0], hi[..., 1], hi[..., 2])

    fx = frac[..., 0:1]
    fy = frac[..., 1:2]
    fz = frac[..., 2:3]
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


@partial(jax.jit, static_argnames=("config",))
def augment_sample(rng, img, boxes, config: AugmentConfig):
    """Augment one (D,H,W,C) image + its (M,6) fractional boxes."""
    shape = jnp.asarray(img.shape[:3], jnp.float32)

    for axis in config.flip_axes:
        rng, key = jax.random.split(rng)
        do = jax.random.bernoulli(key, config.flip_prob)
        img = jnp.where(do, jnp.flip(img, axis=axis), img)
        boxes = jnp.where(do, _flip_boxes(boxes, axis, 1.0 / img.shape[axis]), boxes)

    for a, b in config.rot90_planes:
        if img.shape[a] != img.shape[b]:
            continue  # rot90 would change the static shape; skip (cube-only)
        rng, key = jax.random.split(rng)
        do = jax.random.bernoulli(key, config.rot90_prob)
        img = jnp.where(do, jnp.rot90(img, 1, axes=(a, b)), img)
        boxes = jnp.where(do, _rot90_boxes(boxes, a, b, 1.0 / img.shape[a]), boxes)

    if config.affine_prob > 0.0:
        rng, kdo, kt, ks = jax.random.split(rng, 4)
        do = jax.random.bernoulli(kdo, config.affine_prob)
        t = jax.random.uniform(
            kt, (3,), minval=-config.translate_range, maxval=config.translate_range
        )
        s = 1.0 + jax.random.uniform(
            ks, (3,), minval=-config.scale_range, maxval=config.scale_range
        )
        t = jnp.where(do, t, 0.0)
        s = jnp.where(do, s, 1.0)

        center = (shape - 1.0) / 2.0
        grid = jnp.stack(
            jnp.meshgrid(
                jnp.arange(img.shape[0], dtype=jnp.float32),
                jnp.arange(img.shape[1], dtype=jnp.float32),
                jnp.arange(img.shape[2], dtype=jnp.float32),
                indexing="ij",
            ),
            axis=-1,
        )
        # forward map T(v) = s*(v - c) + c + t in voxel-index space
        # (c = (S-1)/2) => sample input at T^{-1}(o)
        coords = (grid - center - t) / s + center
        img = trilinear_resample(img, coords)
        # boxes transform in the same voxel-index space as the resample grid
        lo_vox = s * (boxes[..., :3] * shape - center) + center + t
        hi_vox = s * (boxes[..., 3:] * shape - center) + center + t
        boxes = jnp.concatenate([lo_vox / shape, hi_vox / shape], axis=-1)

    if config.shift_intensity > 0.0:
        rng, kdo, kv = jax.random.split(rng, 3)
        do = jax.random.bernoulli(kdo, config.shift_prob)
        off = jax.random.uniform(
            kv, (), minval=-config.shift_intensity, maxval=config.shift_intensity
        )
        img = img + jnp.where(do, off, 0.0)

    if config.scale_intensity > 0.0:
        rng, kdo, kv = jax.random.split(rng, 3)
        do = jax.random.bernoulli(kdo, config.scale_prob)
        fac = jax.random.uniform(
            kv, (), minval=-config.scale_intensity, maxval=config.scale_intensity
        )
        img = img * (1.0 + jnp.where(do, fac, 0.0))

    return img, boxes


@partial(jax.jit, static_argnames=("config",))
def augment_batch(rng, images, boxes, config: AugmentConfig):
    """vmap over the batch: images (B,D,H,W,C), boxes (B,M,6)."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda k, i, b: augment_sample(k, i, b, config))(keys, images, boxes)
