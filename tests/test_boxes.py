"""Bit-parity tests for the box geometry library against torch-reference formulas.

The expected values are computed with an independent torch implementation of
the reference math (lesions3d/utils.py:42-154) so any drift in the JAX ops is
caught numerically.
"""

import numpy as np
import jax.numpy as jnp
import torch
import pytest

from mslesions3d_tpu.ops import (
    box_volume,
    center_to_corner,
    corner_to_center,
    decode_boxes,
    encode_boxes,
    pairwise_intersection,
    pairwise_iou,
)


def torch_center_to_corner(c):
    return torch.cat([c[:, :3] - c[:, 3:] / 2, c[:, :3] + c[:, 3:] / 2], 1)


def torch_corner_to_center(x):
    return torch.cat([(x[:, 3:] + x[:, :3]) / 2, x[:, 3:] - x[:, :3]], 1)


def torch_encode(c, p):
    return torch.cat(
        [(c[:, :3] - p[:, :3]) / (p[:, 3:] / 10), torch.log(c[:, 3:] / p[:, 3:]) * 5], 1
    )


def torch_decode(g, p):
    return torch.cat([g[:, :3] * p[:, 3:] / 10 + p[:, :3], torch.exp(g[:, 3:] / 5) * p[:, 3:]], 1)


def torch_iou(s1, s2):
    lower = torch.max(s1[:, :3].unsqueeze(1), s2[:, :3].unsqueeze(0))
    upper = torch.min(s1[:, 3:].unsqueeze(1), s2[:, 3:].unsqueeze(0))
    dims = torch.clamp(upper - lower, min=0)
    inter = dims[:, :, 0] * dims[:, :, 1] * dims[:, :, 2]
    v1 = (s1[:, 3] - s1[:, 0]) * (s1[:, 4] - s1[:, 1]) * (s1[:, 5] - s1[:, 2])
    v2 = (s2[:, 3] - s2[:, 0]) * (s2[:, 4] - s2[:, 1]) * (s2[:, 5] - s2[:, 2])
    union = v1.unsqueeze(1) + v2.unsqueeze(0) - inter
    return inter / union


@pytest.fixture
def random_boxes():
    rng = np.random.default_rng(970205)
    centers = rng.uniform(0.2, 0.8, size=(40, 3)).astype(np.float32)
    sizes = rng.uniform(0.05, 0.3, size=(40, 3)).astype(np.float32)
    return np.concatenate([centers, sizes], axis=1)


def test_center_corner_roundtrip(random_boxes):
    c = jnp.asarray(random_boxes)
    corner = center_to_corner(c)
    back = corner_to_center(corner)
    np.testing.assert_allclose(np.asarray(back), random_boxes, rtol=1e-6, atol=1e-6)

    expected = torch_center_to_corner(torch.tensor(random_boxes)).numpy()
    np.testing.assert_allclose(np.asarray(corner), expected, rtol=1e-6, atol=1e-6)


def test_encode_decode_parity(random_boxes):
    rng = np.random.default_rng(7)
    priors = np.concatenate(
        [
            rng.uniform(0.2, 0.8, size=(40, 3)),
            rng.uniform(0.05, 0.3, size=(40, 3)),
        ],
        axis=1,
    ).astype(np.float32)

    enc = encode_boxes(jnp.asarray(random_boxes), jnp.asarray(priors))
    expected = torch_encode(torch.tensor(random_boxes), torch.tensor(priors)).numpy()
    # fp32 log/exp differ slightly between XLA CPU and torch's libm.
    np.testing.assert_allclose(np.asarray(enc), expected, rtol=5e-4, atol=1e-3)

    dec = decode_boxes(enc, jnp.asarray(priors))
    np.testing.assert_allclose(np.asarray(dec), random_boxes, rtol=1e-3, atol=1e-4)
    expected_dec = torch_decode(torch.tensor(np.asarray(enc)), torch.tensor(priors)).numpy()
    np.testing.assert_allclose(np.asarray(dec), expected_dec, rtol=5e-4, atol=1e-4)


def test_pairwise_iou_parity(random_boxes):
    corners = np.asarray(center_to_corner(jnp.asarray(random_boxes)))
    s1, s2 = corners[:25], corners[25:]

    iou = pairwise_iou(jnp.asarray(s1), jnp.asarray(s2))
    expected = torch_iou(torch.tensor(s1), torch.tensor(s2)).numpy()
    np.testing.assert_allclose(np.asarray(iou), expected, rtol=1e-5, atol=1e-6)

    inter = pairwise_intersection(jnp.asarray(s1), jnp.asarray(s2))
    assert inter.shape == (25, 15)
    assert np.all(np.asarray(inter) >= 0)


def test_iou_identity():
    boxes = jnp.asarray([[0.1, 0.1, 0.1, 0.4, 0.4, 0.4], [0.5, 0.5, 0.5, 0.9, 0.9, 0.9]])
    iou = np.asarray(pairwise_iou(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-6)
    assert iou[0, 1] == 0.0


def test_volume():
    box = jnp.asarray([[0.0, 0.0, 0.0, 0.5, 0.5, 0.5]])
    np.testing.assert_allclose(np.asarray(box_volume(box)), [0.125], rtol=1e-6)


def test_batched_broadcasting():
    rng = np.random.default_rng(0)
    batch = rng.uniform(0.1, 0.4, size=(4, 10, 6)).astype(np.float32)
    batch[..., 3:] += 0.5  # ensure max > min
    iou = pairwise_iou(jnp.asarray(batch), jnp.asarray(batch))
    assert iou.shape == (4, 10, 10)
