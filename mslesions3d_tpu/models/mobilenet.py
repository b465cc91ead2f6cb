"""MobileNet-v1-style 3D backbone (depthwise-separable conv tower).

Parity target: reference MobileNetBase (lesions3d/ssd3d.py:47-110) and the
standalone classifier (lesions3d/mobilenet.py:52-167). Structure:

  features[0]           = ConvBNReLU(stem_channels, first_stride)
  features[1:]          = DepthwiseSeparableBlock per config entry, the first
                          block of each group carrying the group stride
  truncation            : the tower is cut right after feature index
                          max(feature_layers) — the SSD head never consumes
                          deeper maps (ssd3d.py:66-73)
  first_stride          : (2,2,2) for cube inputs, (1,2,2) otherwise
                          (ssd3d.py:60)

Feature-map shapes/channels come from the analytic helper in priors.py
instead of a dummy-tensor forward probe (ssd3d.py:102-110) — shapes of k3/p1
conv stacks are a pure function of strides.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNReLU, DepthwiseSeparableBlock

# stem_channels, then (channels, n_repeat, stride) groups
# (reference lesions3d/mobilenet.py:13-20)
config_mobilenet = (
    32,
    ((64, 1, (2, 2, 2)),
     (128, 2, (2, 2, 2)),
     (256, 2, (2, 2, 2)),
     (512, 6, (2, 2, 2)),
     (1024, 2, (1, 1, 1))),
)

MOBILENET_CONFIGS = {"mobilenet": config_mobilenet}


def mobilenet_layer_plan(
    config_name: str = "mobilenet",
    width_mult: float = 1.0,
    cube: bool = True,
    truncate_after: int | None = None,
):
    """Expand a config into a flat per-layer plan.

    Returns a list of dicts {kind, features, strides}; entry 0 is the stem.
    ``truncate_after`` cuts the tower after that feature index, mirroring the
    reference's break-on-max-aspect-ratio-key (ssd3d.py:66-73).
    """
    stem_channels, groups = MOBILENET_CONFIGS[config_name]
    first_stride = (2, 2, 2) if cube else (1, 2, 2)
    plan = [dict(kind="conv_bn", features=int(stem_channels * width_mult), strides=first_stride)]
    for channels, n_repeat, stride in groups:
        for i in range(n_repeat):
            if truncate_after is not None and len(plan) - 1 == truncate_after:
                return plan
            plan.append(
                dict(
                    kind="dw_block",
                    features=int(channels * width_mult),
                    strides=stride if i == 0 else (1, 1, 1),
                )
            )
    return plan


class MobileNetBackbone(nn.Module):
    """Truncated MobileNet-3D tower returning a dict of feature maps.

    feature_layers are indices into the flat layer plan (reference
    aspect_ratios keys, default {3, 5, 7}).
    """

    feature_layers: Sequence[int] = (3, 5, 7)
    config_name: str = "mobilenet"
    width_mult: float = 1.0
    cube: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False
    remat: bool = False  # rematerialize blocks: trade FLOPs for activation HBM
    init_scheme: str = "torch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        plan = mobilenet_layer_plan(
            self.config_name, self.width_mult, self.cube, max(self.feature_layers)
        )
        conv_cls, block_cls = ConvBNReLU, DepthwiseSeparableBlock
        if self.remat:
            # train flag (arg 2) is a static python bool
            conv_cls = nn.remat(ConvBNReLU, static_argnums=(2,))
            block_cls = nn.remat(DepthwiseSeparableBlock, static_argnums=(2,))
        wanted = set(self.feature_layers)
        features = {}
        for i, spec in enumerate(plan):
            if spec["kind"] == "conv_bn":
                x = conv_cls(spec["features"], spec["strides"], dtype=self.dtype,
                             init_scheme=self.init_scheme,
                             name=f"layer_{i}")(x, train)
            else:
                x = block_cls(spec["features"], spec["strides"],
                              dtype=self.dtype, use_pallas=self.use_pallas,
                              init_scheme=self.init_scheme,
                              name=f"layer_{i}")(x, train)
            if i in wanted:
                features[i] = x
        return features


class MobileNetClassifier(nn.Module):
    """Full MobileNet-3D with global-avg-pool + dropout + linear head.

    Parity: reference MobileNet / LMobileNetBase (lesions3d/mobilenet.py:
    52-147) — kept for the classification demo task.
    """

    num_classes: int = 3
    width_mult: float = 1.0
    dtype: Any = jnp.float32
    init_scheme: str = "torch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import bias_init_for, kernel_init_for

        plan = mobilenet_layer_plan("mobilenet", self.width_mult, cube=False)
        for i, spec in enumerate(plan):
            layer = ConvBNReLU if spec["kind"] == "conv_bn" else DepthwiseSeparableBlock
            x = layer(spec["features"], spec["strides"], dtype=self.dtype,
                      init_scheme=self.init_scheme, name=f"layer_{i}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2, 3))  # global average pool over D,H,W
        x = nn.Dropout(rate=0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=kernel_init_for(self.init_scheme),
                        bias_init=bias_init_for(self.init_scheme, x.shape[-1]),
                        name="head")(x)
