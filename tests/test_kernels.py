"""Pallas kernel tests (interpret mode on CPU; compiled parity is exercised
on TPU, where the same kernel measured exact parity vs the XLA path)."""

import numpy as np
import jax
import jax.numpy as jnp

from mslesions3d_tpu.kernels.depthwise import (
    depthwise_bn_relu_reference,
    fold_bn,
    fused_depthwise_bn_relu,
)
from mslesions3d_tpu.models import SSD3D, SSD3DConfig


def random_inputs(shape=(2, 6, 8, 8, 128), seed=0):
    rng = np.random.default_rng(seed)
    b, d, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    weights = jnp.asarray(rng.normal(size=(3, 3, 3, c)).astype(np.float32))
    gamma, beta = fold_bn(
        jnp.asarray(np.abs(rng.normal(size=c)) + 0.5, jnp.float32),
        jnp.asarray(rng.normal(size=c), jnp.float32),
        jnp.asarray(rng.normal(size=c), jnp.float32),
        jnp.asarray(np.abs(rng.normal(size=c)) + 0.5, jnp.float32),
    )
    return x, weights, gamma, beta


def test_fused_depthwise_matches_xla():
    x, w, gamma, beta = random_inputs()
    ref = depthwise_bn_relu_reference(x, w, gamma, beta)
    out = fused_depthwise_bn_relu(x, w, gamma, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_depthwise_depth_edges():
    """Depth-1 and depth-2 volumes stress the clamped-neighbor masking."""
    for depth in (1, 2, 3):
        x, w, gamma, beta = random_inputs((1, depth, 8, 8, 128), seed=depth)
        ref = depthwise_bn_relu_reference(x, w, gamma, beta)
        out = fused_depthwise_bn_relu(x, w, gamma, beta, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4,
            err_msg=f"depth={depth}",
        )


def test_fused_depthwise_bf16():
    x, w, gamma, beta = random_inputs(seed=5)
    x16, w16 = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    ref = depthwise_bn_relu_reference(x16, w16, gamma, beta)
    out = fused_depthwise_bn_relu(x16, w16, gamma, beta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
    )


def test_model_pallas_flag_equivalence():
    """use_pallas on/off produce the same detections for the same variables."""
    base = dict(n_classes=2, input_channels=1, input_size=(16, 16, 16), width_mult=1.0)
    cfg_off = SSD3DConfig.create(**base)
    cfg_on = SSD3DConfig.create(**base, use_pallas=True)

    model_off = SSD3D(cfg_off)
    model_on = SSD3D(cfg_on)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    variables = model_off.init(jax.random.PRNGKey(0), x, train=False)

    locs_off, scores_off = model_off.apply(variables, x, train=False)
    locs_on, scores_on = model_on.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(locs_on), np.asarray(locs_off), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(scores_on), np.asarray(scores_off), rtol=1e-4, atol=1e-4
    )


def test_pallas_nms_parity_interpret():
    """Fused Pallas NMS (interpret mode) == XLA fixpoint greedy NMS,
    including K padding to the 128-lane tile."""
    import numpy as np
    import jax.numpy as jnp
    from mslesions3d_tpu.kernels.nms import greedy_nms_pallas
    from mslesions3d_tpu.ops.nms import greedy_nms

    rng = np.random.default_rng(3)
    n, k = 4, 200  # k deliberately not a multiple of 128
    centers = rng.uniform(0.2, 0.8, size=(n, 25, 3))
    idx = rng.integers(0, 25, size=(n, k))
    lo = np.clip(
        np.take_along_axis(centers, idx[..., None], 1)
        + rng.normal(0, 0.03, (n, k, 3)) - 0.04, 0, 1,
    )
    hi = np.clip(lo + rng.uniform(0.04, 0.12, (n, k, 3)), 0, 1)
    boxes = np.concatenate([lo, hi], -1).astype(np.float32)
    valid = rng.uniform(size=(n, k)) > 0.15

    keep_pl = np.asarray(
        greedy_nms_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True)
    )
    keep_xla = np.stack([
        np.asarray(greedy_nms(jnp.asarray(boxes[i]), jnp.asarray(valid[i]), 0.5))
        for i in range(n)
    ])
    np.testing.assert_array_equal(keep_pl, keep_xla)


def test_pallas_nms_tile_skip_prefix_validity():
    """Score-sorted candidates make validity a prefix; fully-invalid tiles
    are skipped in the kernel and must still yield exact parity."""
    import numpy as np
    import jax.numpy as jnp
    from mslesions3d_tpu.kernels.nms import greedy_nms_pallas
    from mslesions3d_tpu.ops.nms import greedy_nms

    rng = np.random.default_rng(9)
    n, k = 3, 384  # 3 tiles of 128
    lo = rng.uniform(0, 0.7, (n, k, 3)).astype(np.float32)
    hi = np.clip(lo + rng.uniform(0.05, 0.3, (n, k, 3)), 0, 1).astype(np.float32)
    boxes = np.concatenate([lo, hi], -1)
    valid = np.zeros((n, k), bool)
    valid[0, :90] = True    # only tile 0 has valid candidates
    valid[1, :200] = True   # tiles 0-1
    valid[2, :] = True      # all tiles
    keep_pl = np.asarray(
        greedy_nms_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True)
    )
    keep_xla = np.stack([
        np.asarray(greedy_nms(jnp.asarray(boxes[i]), jnp.asarray(valid[i]), 0.5))
        for i in range(n)
    ])
    np.testing.assert_array_equal(keep_pl, keep_xla)


def _mk_tail_layer(cin, cout, stride, seed):
    r = np.random.default_rng(seed)
    return dict(
        dw_w=jnp.asarray(r.normal(0, 0.2, (3, 3, 3, cin)).astype(np.float32)),
        dw_gamma=r.normal(1, 0.1, (cin,)).astype(np.float32),
        dw_beta=r.normal(0, 0.1, (cin,)).astype(np.float32),
        pw_w=jnp.asarray(r.normal(0, 0.1, (cin, cout)).astype(np.float32)),
        pw_gamma=r.normal(1, 0.1, (cout,)).astype(np.float32),
        pw_beta=r.normal(0, 0.1, (cout,)).astype(np.float32),
        stride=stride,
    )


def _flagship_tail_layers():
    """Strides 2,1,2,1 with the 96^3 flagship's layer 4..7 channel plan."""
    return [_mk_tail_layer(128, 256, 2, 1), _mk_tail_layer(256, 256, 1, 2),
            _mk_tail_layer(256, 512, 2, 3), _mk_tail_layer(512, 512, 1, 4)]


def test_fused_tail_matches_blockwise():
    """kernels/tail.py: a 4-block dw-separable chain fused in one program
    (strides 2,1,2,1 — the 96^3 flagship's layers 4..7) must match the
    blockwise lax.conv path within bf16 rounding."""
    from mslesions3d_tpu.kernels.tail import fused_tail

    rng = np.random.default_rng(0)
    B, D = 2, 12
    x = jnp.asarray(rng.normal(0, 1, (B, D, D, D, 128)).astype(np.float32))
    x = x.astype(jnp.bfloat16)

    layers = _flagship_tail_layers()

    def blockwise(x):
        outs = []
        for L in layers:
            cin = L["dw_w"].shape[-1]
            y = jax.lax.conv_general_dilated(
                x, L["dw_w"].reshape(3, 3, 3, 1, cin).astype(x.dtype),
                (L["stride"],) * 3, ((1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=cin)
            y = jnp.maximum(
                y.astype(jnp.float32) * L["dw_gamma"] + L["dw_beta"], 0
            ).astype(x.dtype)
            z = jax.lax.dot_general(
                y, L["pw_w"].astype(x.dtype), (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x = jnp.maximum(z * L["pw_gamma"] + L["pw_beta"], 0).astype(x.dtype)
            outs.append(x)
        return outs

    ref = blockwise(x)
    got = fused_tail(x, layers, emit=(1, 3), interpret=True)
    assert got[0].shape == (B, 6, 6, 6, 256)
    assert got[1].shape == (B, 3, 3, 3, 512)
    for g, r in zip(got, [ref[1], ref[3]]):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=0.05, atol=0.05)


def test_fused_tail_lowers_for_tpu():
    """kernels/tail.py must pass the MOSAIC lowering pass, not just
    interpret mode: AOT-export the compiled (interpret=False) kernel for
    platform "tpu" from the CPU host. This is the probe that caught the
    "Only 2D gather is supported" rejection of strided slices on >2-D
    arrays (tail.py module docstring) — interpret-mode tests cannot."""
    from jax import export as jax_export

    from mslesions3d_tpu.kernels.tail import fused_tail

    layers = _flagship_tail_layers()
    x = jnp.zeros((2, 12, 12, 12, 128), jnp.bfloat16)
    fn = jax.jit(lambda x: fused_tail(x, layers, emit=(1, 3)))
    exp = jax_export.export(fn, platforms=["tpu"])(x)
    assert len(exp.mlir_module_serialized) > 0
    out_shapes = [tuple(a.shape) for a in exp.out_avals]
    assert out_shapes == [(2, 6, 6, 6, 256), (2, 3, 3, 3, 512)]


def test_model_pallas_tail_flag_equivalence():
    """use_pallas_tail on/off produce the same locs/scores for the same
    variables (the fused program replaces backbone layers past the first
    feature map); the variable trees are identical, so the flag can be
    flipped on any checkpoint."""
    base = dict(n_classes=2, input_channels=1, input_size=(32, 32, 32),
                width_mult=1.0)
    cfg_off = SSD3DConfig.create(**base)
    cfg_on = SSD3DConfig.create(**base, use_pallas_tail=True)

    model_off = SSD3D(cfg_off)
    model_on = SSD3D(cfg_on)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 32, 1)), jnp.float32)
    variables = model_off.init(jax.random.PRNGKey(0), x, train=False)
    variables_on = model_on.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables_on))

    locs_off, scores_off = model_off.apply(variables, x, train=False)
    locs_on, scores_on = model_on.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(locs_on), np.asarray(locs_off), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(scores_on), np.asarray(scores_off), rtol=2e-3, atol=2e-3)
