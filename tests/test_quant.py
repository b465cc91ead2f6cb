"""int8 post-training quantization: BN-fold parity, int8 arithmetic
exactness, end-to-end detection sanity, and scale bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mslesions3d_tpu.models import SSD3D, SSD3DConfig
from mslesions3d_tpu.quant import (
    _qconv,
    calibrate,
    fold_ssd3d,
    folded_forward,
    make_quantized_detection_fn,
    quantize,
    quantize_ssd3d,
    quantized_forward,
)


def _model_and_variables(**over):
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32),
        width_mult=0.25, **over,
    )
    model = SSD3D(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 32, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # perturb BN stats away from init (mean 0 / var 1) so folding is
    # actually exercised, not trivially the identity affine
    stats = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.uniform(0.05, 0.3, a.shape), a.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    return cfg, model, variables, x


def test_folded_forward_matches_model():
    """BN folding is exact: folded conv+bias chain == SSD3D.apply."""
    cfg, model, variables, x = _model_and_variables()
    locs, scores = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    folded = fold_ssd3d(cfg, variables)
    locs_f, scores_f = jax.jit(lambda x: folded_forward(folded, x))(x)
    np.testing.assert_allclose(np.asarray(locs_f), np.asarray(locs),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores_f), np.asarray(scores),
                               rtol=1e-4, atol=1e-5)


def test_qconv_integer_exactness():
    """When inputs and weights are exact grid points, int8 conv + rescale
    reproduces the float conv bit-for-bit (the arithmetic path is sound)."""
    rng = np.random.default_rng(1)
    x = rng.integers(-100, 101, (1, 6, 6, 6, 4)).astype(np.float32)
    w = rng.integers(-100, 101, (3, 3, 3, 4, 8)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    spec = dict(
        wq=jnp.asarray(w.astype(np.int8)), sx=jnp.float32(1.0),
        scale=jnp.ones((8,), jnp.float32), b=jnp.asarray(b),
        strides=(1, 1, 1), padding=((1, 1),) * 3, groups=1,
    )
    got = np.asarray(_qconv(jnp.asarray(x), spec))
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    ) + b
    np.testing.assert_array_equal(got, want)


def test_quantized_forward_close_to_float():
    """int8 outputs track fp32 within classic PTQ error bounds."""
    cfg, _, variables, x = _model_and_variables()
    folded = fold_ssd3d(cfg, variables)
    qm = quantize(folded, calibrate(folded, x))
    locs_f, scores_f = jax.jit(lambda x: folded_forward(folded, x))(x)
    locs_q, scores_q = jax.jit(lambda x: quantized_forward(qm, x))(x)

    def rel_err(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)

    assert rel_err(locs_q, locs_f) < 0.05, rel_err(locs_q, locs_f)
    assert rel_err(scores_q, scores_f) < 0.05, rel_err(scores_q, scores_f)
    # class rankings survive quantization for the vast majority of priors
    agree = (np.argmax(np.asarray(scores_q), -1)
             == np.argmax(np.asarray(scores_f), -1)).mean()
    assert agree > 0.98, agree


def test_quantized_detection_fn_end_to_end():
    cfg, _, variables, x = _model_and_variables()
    detect = make_quantized_detection_fn(cfg, variables, x, min_score=0.0,
                                         top_k=10)
    det = jax.jit(detect)(x)
    assert det["boxes"].shape == (2, 10, 6)
    assert det["scores"].shape == (2, 10)
    assert np.isfinite(np.asarray(det["boxes"])).all()
    assert (np.asarray(det["count"]) >= 0).all()


def test_quantize_rejects_unsupported():
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32),
        base_network_config="convnet_maxpool_double",
        aspect_ratios={6: [1.0], 9: [1.0]},
    )
    with pytest.raises(ValueError, match="InstanceNorm"):
        fold_ssd3d(cfg, {"params": {}, "batch_stats": {}})

    cfg2, _, variables, x = _model_and_variables(use_l2_rescale=True)
    with pytest.raises(ValueError, match="l2_rescale"):
        fold_ssd3d(cfg2, variables)


def test_calibration_scale_count_checked():
    cfg, _, variables, x = _model_and_variables()
    folded = fold_ssd3d(cfg, variables)
    with pytest.raises(ValueError, match="activation scales"):
        quantize(folded, np.ones(3))


def test_quantized_export_roundtrip(tmp_path):
    """A quantized .mslx bundle serves exactly what the live int8 fn says."""
    from mslesions3d_tpu.serving import ServingDetector, export_detector, save_bundle

    cfg, _, variables, x = _model_and_variables()
    exports, manifest = export_detector(
        cfg, variables, batch_sizes=(2,), nms_impl="xla", dtype="float32",
        quantize="int8", calib_images=np.asarray(x),
    )
    assert manifest["quantize"] == "int8"
    bundle = save_bundle(tmp_path / "q.mslx", exports, manifest)
    served = ServingDetector(bundle).predict(np.asarray(x))

    live = jax.jit(
        make_quantized_detection_fn(cfg, variables, x)
    )(x)
    np.testing.assert_array_equal(served["count"], np.asarray(live["count"]))
    np.testing.assert_allclose(served["boxes"], np.asarray(live["boxes"]),
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="calib_images"):
        export_detector(cfg, variables, batch_sizes=(1,), quantize="int8")


def test_quantized_sliding_window_export_roundtrip(tmp_path):
    """Quantized FULL-VOLUME bundle == live sliding window with the int8
    patch forward (patch_forward hook threads quant through the stitcher)."""
    from mslesions3d_tpu.quant import quantize_ssd3d, quantized_forward
    from mslesions3d_tpu.serving import (
        ServingDetector, export_sliding_window_detector, save_bundle,
    )
    from mslesions3d_tpu.sliding_window import make_sliding_window_detector

    cfg, _, variables, x = _model_and_variables()
    vol_shape = (40, 32, 40)
    calib = np.asarray(x)
    exports, manifest = export_sliding_window_detector(
        cfg, variables, vol_shape, volume_batches=(1,),
        nms_impl="xla", dtype="float32", quantize="int8", calib_images=calib,
    )
    assert manifest["quantize"] == "int8"
    bundle = save_bundle(tmp_path / "q_full.mslx", exports, manifest)

    rng = np.random.default_rng(3)
    vol = rng.normal(0, 1, (1, *vol_shape, 1)).astype(np.float32)
    served = ServingDetector(bundle).predict(vol)

    qm = quantize_ssd3d(cfg, variables, calib)
    live_fn = make_sliding_window_detector(
        cfg, vol_shape, stitch_impl="xla",
        patch_forward=lambda _v, p: quantized_forward(qm, p),
    )
    live = live_fn(variables, jnp.asarray(vol[0]))
    np.testing.assert_array_equal(served["count"][0], np.asarray(live["count"])[0])
    np.testing.assert_allclose(served["boxes"][0], np.asarray(live["boxes"])[0],
                               rtol=1e-5, atol=1e-6)


def test_quantize_ssd3d_weights_are_int8():
    cfg, _, variables, x = _model_and_variables()
    qm = quantize_ssd3d(cfg, variables, x)
    for spec in qm["layers"]:
        assert spec["wq"].dtype == jnp.int8
        assert spec["scale"].shape == (spec["wq"].shape[-1],)
        # per-channel scaling actually uses the int8 range
        assert int(jnp.abs(spec["wq"]).max()) == 127
