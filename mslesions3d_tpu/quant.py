"""Post-training int8 quantization for SSD3D inference.

TPU-first rationale: the v5e MXU executes s8 x s8 -> s32 at twice the bf16
rate, and int8 activations halve the HBM traffic of every feature map — the
two resources the roofline (tools/roofline.py) says this model is bound by.
The reference (torch/cuDNN fp32, no quantization support) has no equivalent;
this is a beyond-parity serving capability.

Pipeline (classic symmetric PTQ):

1. **Fold** — BatchNorm folds into the preceding conv
   (W' = W * gamma_oc, b' = beta, gamma = scale/sqrt(var+eps)), turning the
   backbone into a plain conv(+bias)+ReLU chain and the heads into biased
   convs. `folded_forward` reproduces `SSD3D.apply` bit-for-bit up to fp32
   associativity (tested).
2. **Calibrate** — run the folded fp32 model over a few batches and record
   the absmax of every conv input (one pass, jitted, returns all maxima).
3. **Quantize** — weights: per-output-channel symmetric int8
   (sw[oc] = absmax(W[..., oc]) / 127); activations: per-tensor symmetric
   int8 from the calibration maxima. Biases stay fp32.
4. **Run** — every conv computes in int8 with int32 accumulation
   (`preferred_element_type`), then one fused fp32 rescale
   (y = conv_s32 * (sx * sw) + b) and ReLU; the next layer re-quantizes.
   Decode + NMS + top-k stay fp32 (`ops.nms.detect_objects`).

Scope: the mobilenet backbone family (the flagship). The convnet backbone
uses InstanceNorm (per-sample statistics — not foldable) and is rejected
with a pointed error.

Reference parity note: quantization quality is measured, not assumed — see
QUALITY.md "int8" section for the mAP/F1 delta vs the fp32 model on the
CI-parity dataset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models import SSD3D, SSD3DConfig, model_priors
from .models.mobilenet import mobilenet_layer_plan
from .ops.nms import detect_objects

_DN = ("NDHWC", "DHWIO", "NDHWC")
_BN_EPS = 1e-5


def _fold_bn(kernel, bn_params, bn_stats):
    """Fold conv(no-bias)+BN into (W', b'): W' = W*gamma_oc, b' = beta."""
    gamma = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + _BN_EPS)
    beta = bn_params["bias"] - bn_stats["mean"] * gamma
    return kernel.astype(jnp.float32) * gamma, beta.astype(jnp.float32)


def fold_ssd3d(config: SSD3DConfig, variables) -> dict:
    """Fold a trained SSD3D's variables into a flat conv(+bias)+ReLU program.

    Returns {"layers": [conv specs...], "heads": {layer: (loc, cls)},
    "feature_layers": (...), "config": config}. Each conv spec is a dict
    {w (fp32, DHWIO), b (fp32, per-out-channel), strides, padding, groups,
    emit (feature-map index or None)}.
    """
    if "mobilenet" not in config.base_network_config:
        raise ValueError(
            "int8 quantization supports the mobilenet backbone family; "
            f"{config.base_network_config!r} uses InstanceNorm (per-sample "
            "statistics, not foldable into weights)"
        )
    if config.use_l2_rescale:
        raise ValueError("int8 quantization does not support use_l2_rescale")

    params = variables["params"]
    stats = variables["batch_stats"]
    plan = mobilenet_layer_plan(
        config.base_network_config, config.width_mult, config.cube,
        truncate_after=max(config.feature_layers),
    )
    wanted = set(config.feature_layers)

    layers = []
    for i, spec in enumerate(plan):
        p = params["backbone"][f"layer_{i}"]
        s = stats["backbone"][f"layer_{i}"]
        strides = tuple(spec["strides"]) if not isinstance(spec["strides"], int) \
            else (spec["strides"],) * 3
        if spec["kind"] == "conv_bn":
            w, b = _fold_bn(p["conv"]["kernel"], p["bn"], s["bn"])
            k = p["conv"]["kernel"].shape[0]
            layers.append(dict(
                w=w, b=b, strides=strides, groups=1,
                padding=((k // 2, k // 2),) * 3,
                emit=i if i in wanted else None,
            ))
        else:  # dw_block: depthwise conv+BN+ReLU then pointwise conv+BN+ReLU
            dw_w, dw_b = _fold_bn(p["dw_conv"]["kernel"], p["dw_bn"], s["dw_bn"])
            c_in = dw_w.shape[-1]
            layers.append(dict(
                w=dw_w, b=dw_b, strides=strides, groups=c_in,
                padding=((1, 1),) * 3, emit=None,
            ))
            pw_w, pw_b = _fold_bn(p["pw_conv"]["kernel"], p["pw_bn"], s["pw_bn"])
            layers.append(dict(
                w=pw_w, b=pw_b, strides=(1, 1, 1), groups=1,
                padding=((0, 0),) * 3, emit=i if i in wanted else None,
            ))

    heads = {}
    for k in sorted(wanted):
        heads[k] = tuple(
            dict(
                w=params["heads"][f"{name}_{k}"]["kernel"].astype(jnp.float32),
                b=params["heads"][f"{name}_{k}"]["bias"].astype(jnp.float32),
                strides=(1, 1, 1), groups=1, padding=((1, 1),) * 3, emit=None,
            )
            for name in ("loc", "cls")
        )
    return dict(layers=layers, heads=heads,
                feature_layers=tuple(sorted(wanted)), config=config)


def _conv(x, spec):
    return jax.lax.conv_general_dilated(
        x, spec["w"], spec["strides"], spec["padding"],
        dimension_numbers=_DN, feature_group_count=spec["groups"],
    ) + spec["b"]


def _reshape_heads(loc, cls, n_classes):
    batch = loc.shape[0]
    return loc.reshape(batch, -1, 6), cls.reshape(batch, -1, n_classes)


def folded_forward(folded: dict, images, record=None):
    """fp32 forward of the folded program; mirrors SSD3D.apply(train=False).

    ``record``: optional list — every conv input's absmax is appended (as a
    traced scalar), in deterministic order: backbone layers, then per
    feature layer one shared head-input scale. Used by ``calibrate``.
    """
    cfg = folded["config"]
    x = images.astype(jnp.float32)
    features = {}
    for spec in folded["layers"]:
        if record is not None:
            record.append(jnp.max(jnp.abs(x)))
        x = jax.nn.relu(_conv(x, spec))
        if spec["emit"] is not None:
            features[spec["emit"]] = x

    locs, scores = [], []
    for k in folded["feature_layers"]:
        f = features[k]
        if record is not None:
            record.append(jnp.max(jnp.abs(f)))
        loc_spec, cls_spec = folded["heads"][k]
        lo, cl = _reshape_heads(_conv(f, loc_spec), _conv(f, cls_spec),
                                cfg.n_classes)
        locs.append(lo)
        scores.append(cl)
    return jnp.concatenate(locs, 1), jnp.concatenate(scores, 1)


def calibrate(folded: dict, images) -> np.ndarray:
    """Per-conv-input absmax over calibration images (one jitted pass).

    images: (N, D, H, W, C) fp32 — a handful of representative volumes.
    Returns a vector of scales aligned with folded_forward's record order.
    """

    @jax.jit
    def maxima(imgs):
        rec = []
        folded_forward(folded, imgs, record=rec)
        return jnp.stack(rec)

    m = np.asarray(maxima(jnp.asarray(images, jnp.float32)), np.float64)
    return np.maximum(m, 1e-6) / 127.0


def quantize(folded: dict, act_scales: np.ndarray) -> dict:
    """int8-quantize a folded program with calibration activation scales."""
    scales = list(np.asarray(act_scales, np.float64))
    want = len(folded["layers"]) + len(folded["feature_layers"])
    if len(scales) != want:
        raise ValueError(f"expected {want} activation scales, got {len(scales)}")

    def qweights(spec, sx):
        w = np.asarray(spec["w"], np.float64)
        sw = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(0), 1e-12) / 127.0
        wq = np.clip(np.rint(w / sw), -127, 127).astype(np.int8)
        out = dict(spec)
        out.update(
            wq=jnp.asarray(wq), sx=jnp.float32(sx),
            # fused output rescale: conv_s32 * (sx*sw) + b
            scale=jnp.asarray((sx * sw).astype(np.float32)),
            b=jnp.asarray(np.asarray(spec["b"], np.float32)),
        )
        del out["w"]
        return out

    qlayers = [qweights(spec, scales[i]) for i, spec in enumerate(folded["layers"])]
    qheads = {}
    for j, k in enumerate(folded["feature_layers"]):
        sx = scales[len(folded["layers"]) + j]
        qheads[k] = tuple(qweights(s, sx) for s in folded["heads"][k])
    return dict(layers=qlayers, heads=qheads,
                feature_layers=folded["feature_layers"],
                config=folded["config"])


def _qconv(x, spec):
    """Symmetric int8 conv with int32 accumulation + fused fp32 rescale."""
    q = jnp.clip(jnp.round(x / spec["sx"]), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        q, spec["wq"], spec["strides"], spec["padding"],
        dimension_numbers=_DN, feature_group_count=spec["groups"],
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * spec["scale"] + spec["b"]


def quantized_forward(qmodel: dict, images):
    """int8 forward: every conv in s8 x s8 -> s32; ReLU + requantize between."""
    cfg = qmodel["config"]
    x = images.astype(jnp.float32)
    features = {}
    for spec in qmodel["layers"]:
        x = jax.nn.relu(_qconv(x, spec))
        if spec["emit"] is not None:
            features[spec["emit"]] = x

    locs, scores = [], []
    for k in qmodel["feature_layers"]:
        f = features[k]
        loc_spec, cls_spec = qmodel["heads"][k]
        lo, cl = _reshape_heads(_qconv(f, loc_spec), _qconv(f, cls_spec),
                                cfg.n_classes)
        locs.append(lo)
        scores.append(cl)
    return jnp.concatenate(locs, 1), jnp.concatenate(scores, 1)


def quantize_ssd3d(config: SSD3DConfig, variables, calib_images) -> dict:
    """fold + calibrate + quantize in one call."""
    folded = fold_ssd3d(config, variables)
    return quantize(folded, calibrate(folded, calib_images))


def make_quantized_detection_fn(config: SSD3DConfig, variables, calib_images,
                                *, min_score=None, top_k=None,
                                nms_impl: str = "xla"):
    """End-to-end int8 detector: images -> {boxes, labels, scores, count}.

    Same signature/outputs as serving._detection_fn; jittable and
    jax.export-able (the int8 weights become baked constants).
    """
    qm = quantize_ssd3d(config, variables, calib_images)
    priors = jnp.asarray(model_priors(config))
    min_score = config.min_score if min_score is None else min_score
    top_k = config.top_k if top_k is None else top_k

    def detect(images):
        locs, scores = quantized_forward(qm, images)
        return detect_objects(
            locs, scores, priors,
            n_classes=config.n_classes, min_score=min_score,
            max_overlap=config.max_overlap, top_k=top_k, nms_impl=nms_impl,
        )

    return detect
