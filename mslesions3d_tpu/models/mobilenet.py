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

import jax
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
    use_pallas_tail: bool = False
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

        # fused deep tail (inference only): every block past the FIRST
        # wanted feature map runs as ONE VMEM-resident Pallas program
        # (kernels/tail.py) — 12^3-and-smaller maps pay more in per-conv
        # dispatch latency + HBM round-trips than in math. Falls back to
        # the layer-by-layer path in training, for non-block tails, or for
        # non-lane-aligned channel counts.
        tail_from = min(self.feature_layers) + 1
        tail_specs = plan[tail_from:]
        fuse_tail = (
            self.use_pallas_tail
            and not train
            and len(tail_specs) > 0
            # at least one wanted feature map must lie in the tail, else
            # the tail is dead code (XLA DCEs it on the standard path)
            and any(i >= tail_from for i in wanted)
            and all(s["kind"] == "dw_block" for s in tail_specs)
            and all(s["features"] % 128 == 0 for s in tail_specs)
            # the fused kernel assumes cubic strides (the dw blocks always
            # are; only the stem may be (1,2,2))
            and all(len(set(s["strides"])) == 1 if isinstance(s["strides"], tuple)
                    else True for s in tail_specs)
        )

        features = {}
        for i, spec in enumerate(plan[:tail_from] if fuse_tail else plan):
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

        if fuse_tail:
            from ..kernels.tail import fused_tail

            if x.shape[-1] % 128 != 0:
                raise ValueError(
                    "use_pallas_tail needs lane-aligned tail input channels; "
                    f"got {x.shape[-1]} (width_mult too small?)"
                )
            layers = []
            in_f = x.shape[-1]
            for j, spec in enumerate(tail_specs):
                # plain DepthwiseSeparableBlock (never the remat wrapper):
                # collect_folded declares the identical variables and does
                # no compute, so there is nothing to rematerialize. The
                # dummy carries only the chained in_features.
                dummy = jnp.zeros((1, 1, 1, 1, in_f), self.dtype)
                layers.append(DepthwiseSeparableBlock(
                    spec["features"], spec["strides"], dtype=self.dtype,
                    init_scheme=self.init_scheme,
                    name=f"layer_{tail_from + j}",
                )(dummy, train, collect_folded=True))
                in_f = spec["features"]
            emit = tuple(i - tail_from for i in sorted(wanted)
                         if i >= tail_from)
            outs = fused_tail(
                x.astype(self.dtype), layers, emit,
                interpret=jax.default_backend() != "tpu",
            )
            for i, out in zip([e + tail_from for e in emit], outs):
                features[i] = out
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
