"""Pallas TPU kernel: fused greedy 3D NMS (IoU + suppression fixpoint in VMEM).

The XLA NMS path materializes a per-image (K, K) IoU matrix in HBM — at the
headline inference shape (batch 128, K = 10*top_k = 1000 candidates) that is
~0.5 GB of HBM traffic and ~6.5 ms of a ~16 ms detection step. But one
image's candidate boxes are only K*6 floats (~24 KB): the whole problem fits
in VMEM. This kernel runs one grid program per (image, class):

* streams the candidate boxes into VMEM once (both (K,6) and (6,K) layouts,
  prepared by the caller, so no in-kernel transposes are needed);
* builds the thresholded suppression matrix M[j,i] = (IoU(j,i) > t) & (j<i)
  tile-by-tile (128x128 VPU blocks, upper triangle only) into a bf16 VMEM
  scratch — it never touches HBM;
* solves the greedy recurrence keep[i] = valid[i] & ~any_{j<i}(keep[j] &
  M[j,i]) by fixpoint iteration, one (1,K)x(K,K) MXU mat-vec per step (see
  ops/nms.py:greedy_nms for the convergence argument — the iteration is
  EXACT greedy NMS, matching the reference's sequential suppression loop,
  lesions3d/ssd3d.py:413-426).

Semantics are identical to ops.nms.greedy_nms / greedy_nms_sequential
(parity-tested); this is purely a bandwidth optimization. K is padded to a
multiple of 128 lanes; padded rows are invalid and degenerate (IoU 0 via the
union epsilon), so they neither suppress nor survive.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128
_UNION_EPS = 1e-12


def _nms_kernel(
    boxes_ref, boxes_t_ref, valid_ref, keep_ref, m_ref, kv_ref, *, max_overlap
):
    """One program = one (image, class) candidate set.

    boxes_ref   (1, K, 6)      f32 corner boxes, score-sorted
    boxes_t_ref (1, 6, nt, T)  f32 same data, transposed + lane-tiled: entry
                               [0, d, s, :] is coordinate d of column tile s.
                               The tiling puts every column slice at lane
                               offset 0 — Mosaic can only sublane-broadcast
                               a (1, T) lane vector with zero lane offset.
    valid_ref   (1, 1, K)      f32 1.0 = candidate above min_score
    keep_ref    (1, 1, K)      f32 out: 1.0 = kept by greedy NMS
    m_ref       (K, K)         bf16 VMEM scratch: suppression matrix
    """
    k = keep_ref.shape[2]
    nt = k // _TILE

    # Data-adaptive trip count: an invalid candidate (score <= min_score, or
    # padding) can neither suppress (keep[j] is always 0) nor survive
    # (keep[i] forced 0 by valid), so M tiles past the last valid candidate
    # may stay zero. detect_objects feeds score-SORTED candidates, making
    # validity a prefix — only ceil(last_valid/T) tiles carry any work (IoU
    # build, memset, AND the fixpoint mat-vec below), and at serving-time
    # min_scores that skips most of the O(K^2) cost. This mirrors the
    # reference, which filters by min_score BEFORE its NMS loop
    # (ssd3d.py:389-394). Non-prefix validity is still exact: the bound uses
    # the LAST valid index, not the count.
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1) + 1
    last_valid = jnp.max(jnp.where(valid_ref[0] > 0.0, pos, 0))  # 0 if none
    nt_active = jnp.minimum((last_valid + _TILE - 1) // _TILE, nt)

    def row_body(t, _):
        rt = pl.ds(t * _TILE, _TILE)
        m_ref[rt, :] = jnp.zeros((_TILE, k), jnp.bfloat16)
        r_lo = [boxes_ref[0, rt, d : d + 1] for d in range(3)]
        r_hi = [boxes_ref[0, rt, d + 3 : d + 4] for d in range(3)]
        vol_r = r_lo[0] * 0.0 + 1.0
        for d in range(3):
            vol_r = vol_r * (r_hi[d] - r_lo[d])  # (T, 1)

        def col_body(s, _):
            # column tile: suppressees i (j < i => s >= t)
            inter = jnp.ones((_TILE, _TILE), jnp.float32)
            vol_c = jnp.ones((1, _TILE), jnp.float32)
            for d in range(3):
                c_lo = boxes_t_ref[0, d, pl.ds(s, 1), :]  # (1, T), lane offset 0
                c_hi = boxes_t_ref[0, d + 3, pl.ds(s, 1), :]
                vol_c = vol_c * (c_hi - c_lo)
                lower = jnp.maximum(r_lo[d], c_lo)  # (T, T)
                upper = jnp.minimum(r_hi[d], c_hi)
                inter = inter * jnp.maximum(upper - lower, 0.0)
            union = jnp.maximum(vol_r + vol_c - inter, _UNION_EPS)
            iou = inter / union
            row_g = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0) + t * _TILE
            col_g = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1) + s * _TILE
            blk = (iou > max_overlap) & (row_g < col_g)
            m_ref[rt, pl.ds(s * _TILE, _TILE)] = blk.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(t, nt_active, col_body, 0)
        return 0

    jax.lax.fori_loop(0, nt_active, row_body, 0)

    valid_row = valid_ref[0]  # (1, K) f32

    def cond(carry):
        return carry[1]

    def body(carry):
        keep, _ = carry
        # Mosaic can't dynamic_slice a value: stage keep through VMEM so the
        # active-tile loop can slice it with pl.ds.
        kv_ref[:] = keep.astype(jnp.bfloat16)

        # counts[i] = sum_j keep[j] * M[j, i], accumulated over ACTIVE row
        # tiles only — rows past last_valid hold keep[j]=0 (and were never
        # zeroed), so they must not be read.
        def acc_tile(t, counts):
            kt = kv_ref[:, pl.ds(t * _TILE, _TILE)]
            mt = m_ref[pl.ds(t * _TILE, _TILE), :]
            return counts + jnp.dot(kt, mt, preferred_element_type=jnp.float32)

        counts = jax.lax.fori_loop(
            0, nt_active, acc_tile, jnp.zeros((1, k), jnp.float32)
        )  # (1, K): number of kept higher-scored suppressors of each i
        new = jnp.where((counts == 0.0) & (valid_row > 0.0), 1.0, 0.0)
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid_row, jnp.bool_(True)))
    keep_ref[0] = keep


@partial(jax.jit, static_argnames=("max_overlap", "interpret"))
def greedy_nms_pallas(
    boxes: jnp.ndarray,  # (N, K, 6) f32 corner, score-sorted per row
    valid: jnp.ndarray,  # (N, K) bool
    max_overlap: float,
    interpret: bool = False,
) -> jnp.ndarray:  # (N, K) bool keep mask
    """Batched exact greedy NMS, one grid program per candidate set."""
    n, k, _ = boxes.shape
    k_pad = ((k + _TILE - 1) // _TILE) * _TILE
    if k_pad != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, k_pad - k), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, k_pad - k)))

    nt = k_pad // _TILE
    boxes = boxes.astype(jnp.float32)
    boxes_t = jnp.swapaxes(boxes, 1, 2).reshape(n, 6, nt, _TILE)  # lane-tiled
    # (N, 1, K): a singleton sublane dim keeps the trailing two block dims
    # equal to the array dims (Mosaic tiling requirement)
    valid_f = valid.astype(jnp.float32)[:, None, :]

    keep_f = pl.pallas_call(
        partial(_nms_kernel, max_overlap=float(max_overlap)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, k_pad, 6), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 6, nt, _TILE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k_pad, k_pad), jnp.bfloat16),
            pltpu.VMEM((1, k_pad), jnp.bfloat16),
        ],
        interpret=interpret,
    )(boxes, boxes_t, valid_f)

    return keep_f[:, 0, :k] > 0.5
