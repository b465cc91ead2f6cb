"""3D box geometry kernel library (pure JAX, jit/vmap-friendly).

Conventions
-----------
* Corner form:  (x_min, y_min, z_min, x_max, y_max, z_max), fractional [0, 1].
* Center form:  (c_x, c_y, c_z, w, h, d).
* All functions broadcast over arbitrary leading axes; the box axis is the
  trailing axis of size 6. Static shapes everywhere — callers pad ragged box
  sets and carry validity masks.

Numerics mirror the reference formulas so that metrics are bit-comparable:
* encode/decode use SSD "variances": centers are scaled by prior_size / 10,
  sizes are log-ratios scaled by 5 (reference: lesions3d/utils.py:54-89).
* pairwise IoU is the broadcasted corner-form intersection / union
  (reference: lesions3d/utils.py:105-149).
"""

from __future__ import annotations

import jax.numpy as jnp

CENTER_VARIANCE = 10.0
SIZE_VARIANCE = 5.0


def center_to_corner(boxes_cwhd: jnp.ndarray) -> jnp.ndarray:
    """Center-size -> corner coordinates. (reference: utils.py:42-51)"""
    centers = boxes_cwhd[..., :3]
    half = boxes_cwhd[..., 3:] / 2.0
    return jnp.concatenate([centers - half, centers + half], axis=-1)


def corner_to_center(boxes_xyz: jnp.ndarray) -> jnp.ndarray:
    """Corner -> center-size coordinates. (reference: utils.py:92-102)"""
    lo = boxes_xyz[..., :3]
    hi = boxes_xyz[..., 3:]
    return jnp.concatenate([(hi + lo) / 2.0, hi - lo], axis=-1)


def encode_boxes(boxes_cwhd: jnp.ndarray, priors_cwhd: jnp.ndarray) -> jnp.ndarray:
    """Encode center-form boxes as regression offsets w.r.t. priors.

    g_center = (center - prior_center) / (prior_size / 10)
    g_size   = log(size / prior_size) * 5
    (reference: utils.py:71-89)
    """
    g_center = (boxes_cwhd[..., :3] - priors_cwhd[..., :3]) / (
        priors_cwhd[..., 3:] / CENTER_VARIANCE
    )
    g_size = jnp.log(boxes_cwhd[..., 3:] / priors_cwhd[..., 3:]) * SIZE_VARIANCE
    return jnp.concatenate([g_center, g_size], axis=-1)


def decode_boxes(offsets: jnp.ndarray, priors_cwhd: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`encode_boxes`; returns center-form boxes.

    (reference: utils.py:54-68)
    """
    centers = offsets[..., :3] * priors_cwhd[..., 3:] / CENTER_VARIANCE + priors_cwhd[..., :3]
    sizes = jnp.exp(offsets[..., 3:] / SIZE_VARIANCE) * priors_cwhd[..., 3:]
    return jnp.concatenate([centers, sizes], axis=-1)


def box_volume(boxes_xyz: jnp.ndarray) -> jnp.ndarray:
    """Volume of corner-form boxes; shape (..., 6) -> (...). (reference: utils.py:152-154)"""
    dims = boxes_xyz[..., 3:] - boxes_xyz[..., :3]
    return dims[..., 0] * dims[..., 1] * dims[..., 2]


def pairwise_intersection(set_1: jnp.ndarray, set_2: jnp.ndarray) -> jnp.ndarray:
    """Intersection volume of every box pair.

    set_1: (..., n1, 6) corner form; set_2: (..., n2, 6) corner form.
    Returns (..., n1, n2). (reference: utils.py:105-122)
    """
    lower = jnp.maximum(set_1[..., :, None, :3], set_2[..., None, :, :3])
    upper = jnp.minimum(set_1[..., :, None, 3:], set_2[..., None, :, 3:])
    dims = jnp.clip(upper - lower, 0.0)
    return dims[..., 0] * dims[..., 1] * dims[..., 2]


def pairwise_iou(set_1: jnp.ndarray, set_2: jnp.ndarray) -> jnp.ndarray:
    """Jaccard overlap (IoU) of every box pair; shapes as in pairwise_intersection.

    (reference: utils.py:125-149)
    """
    inter = pairwise_intersection(set_1, set_2)
    vol_1 = box_volume(set_1)
    vol_2 = box_volume(set_2)
    union = vol_1[..., :, None] + vol_2[..., None, :] - inter
    return inter / union
