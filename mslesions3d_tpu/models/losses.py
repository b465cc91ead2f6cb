"""MultiBox loss: localization L1 + confidence cross-entropy, fully vectorized.

Parity target: reference MultiBoxLoss (lesions3d/ssd3d.py:741-941):

* loc loss = plain L1 (torch nn.L1Loss — named smooth_l1 but not smooth;
  ssd3d.py:758), averaged over positive priors' 6 coordinates;
* conf loss = cross entropy over ALL priors, ignore-band (-1) zeroed, summed
  and normalized by the total positive count — the reference's hard-negative
  mining is commented out (ssd3d.py:926-933) so the parity default sums every
  negative; mining is available behind ``hard_negative_mining=True``;
* soft two-threshold matching produces the -1 ignore labels.

All shapes static: GT arrives padded (B, M, 6)/(B, M) with a validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.boxes import center_to_corner
from ..ops.matching import match_priors_batch


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE with integer labels; labels must be pre-clamped >= 0."""
    logits = logits.astype(jnp.float32)
    log_z = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return log_z - true_logit


@partial(
    jax.jit,
    static_argnames=(
        "soft", "hard_negative_mining", "neg_pos_ratio", "focal_gamma", "focal_alpha",
    ),
)
def multibox_loss(
    predicted_locs: jnp.ndarray,  # (B, P, 6)
    predicted_scores: jnp.ndarray,  # (B, P, C) logits
    gt_boxes: jnp.ndarray,  # (B, M, 6) corner form, padded
    gt_labels: jnp.ndarray,  # (B, M) padded with 0
    gt_mask: jnp.ndarray,  # (B, M) bool
    priors_center: jnp.ndarray,  # (P, 6)
    threshold_lo,
    threshold_hi=0.0,
    batch_mask: jnp.ndarray | None = None,  # (B,) False for padded batch rows
    *,
    soft: bool = False,
    neg_pos_ratio: int = 3,
    hard_negative_mining: bool = False,
    focal_gamma: float = 0.0,
    focal_alpha: float = 0.25,
):
    """Returns (conf_loss, loc_loss) scalars (fp32).

    focal_gamma > 0 switches the confidence term to a softmax focal loss
    FL = -alpha_t (1-p_t)^gamma log(p_t) — the reference's commented-out
    FocalLoss alternative (ssd3d.py:760: gamma=2, weight 0.25, background
    excluded from the alpha weight).
    """
    if batch_mask is not None:
        gt_mask = gt_mask & batch_mask[:, None]
    priors_corner = center_to_corner(priors_center)
    loc_targets, cls_targets = match_priors_batch(
        gt_boxes, gt_labels, gt_mask, priors_corner, priors_center,
        threshold_lo, threshold_hi, soft=soft,
    )  # (B, P, 6), (B, P)

    positive = cls_targets > 0  # (B, P)
    n_positives = positive.sum()

    # LOCALIZATION: mean |diff| over positive priors' coordinates.
    diff = jnp.abs(predicted_locs.astype(jnp.float32) - loc_targets)
    loc_loss = jnp.sum(diff * positive[..., None]) / jnp.maximum(n_positives * 6, 1)

    # CONFIDENCE: CE over all priors; ignore band (-1) contributes zero.
    ce = _cross_entropy(predicted_scores, jnp.maximum(cls_targets, 0))  # (B, P)
    if focal_gamma > 0.0:
        p_t = jnp.exp(-ce)  # prob of the target class
        alpha_t = jnp.where(cls_targets > 0, focal_alpha, 1.0 - focal_alpha)
        ce = alpha_t * (1.0 - p_t) ** focal_gamma * ce
    ce = jnp.where(cls_targets < 0, 0.0, ce)
    if batch_mask is not None:
        ce = jnp.where(batch_mask[:, None], ce, 0.0)

    if hard_negative_mining:
        # Keep positives + the top (neg_pos_ratio * n_pos_i) hardest negatives
        # per image (the reference's commented-out branch, ssd3d.py:926-932).
        neg_ce = jnp.where(positive, 0.0, ce)
        order = jnp.argsort(-neg_ce, axis=1)
        ranks = jnp.zeros_like(order).at[
            jnp.arange(order.shape[0])[:, None], order
        ].set(jnp.arange(order.shape[1])[None, :])
        n_hard = neg_pos_ratio * positive.sum(axis=1, keepdims=True)
        hard_neg = (ranks < n_hard) & ~positive
        conf_sum = jnp.sum(jnp.where(positive | hard_neg, ce, 0.0))
    else:
        conf_sum = jnp.sum(ce)  # positives + ALL negatives (parity default)

    conf_loss = conf_sum / jnp.maximum(n_positives, 1).astype(jnp.float32)
    return conf_loss, loc_loss


def multibox_loss_from_config(config, predicted_locs, predicted_scores,
                              gt_boxes, gt_labels, gt_mask, priors_center,
                              batch_mask=None, hard_negative_mining: bool = False):
    """Config-driven wrapper resolving thresholds + focal options."""
    if config.soft_matching:
        lo, hi = config.threshold
        soft = True
    else:
        lo, hi, soft = config.threshold[0], 0.0, False
    return multibox_loss(
        predicted_locs, predicted_scores, gt_boxes, gt_labels, gt_mask,
        priors_center, lo, hi, batch_mask, soft=soft,
        hard_negative_mining=hard_negative_mining,
        focal_gamma=getattr(config, "focal_gamma", 0.0),
        focal_alpha=getattr(config, "focal_alpha", 0.25),
    )
