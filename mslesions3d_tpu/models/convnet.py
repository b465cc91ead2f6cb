"""Plain 3D ConvNet backbone (alternative to MobileNet).

Parity target: reference ConvNetBase + CONVNET_CONFIGS
(lesions3d/base_network.py:18-126): stacks of Conv+InstanceNorm+Dropout+PReLU
blocks, optionally downsampled by strided convs or MaxPool3d(k3,s2,p1); the
tower truncates after max(feature_layers).

Note: the reference's SSD wiring for this backbone crashes on a typo
(`self.boxes.per_location`, ssd3d.py:281); here the convnet path is a
first-class, working choice.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormActBlock, max_pool_3d

# (out_channels | 'maxpool3d', stride) — padding is always 1 (SAME for k3).
# (reference base_network.py:18-54)
config_no_maxpool = (
    (32, (1, 1, 1)), (32, (1, 1, 1)),
    (64, (2, 2, 2)), (64, (1, 1, 1)),
    (128, (2, 2, 2)), (128, (1, 1, 1)),
    (256, (2, 2, 2)), (256, (1, 1, 1)),
)

config_maxpool_simple = (
    (32, (1, 1, 1)), (32, (1, 1, 1)),
    ("maxpool3d", (2, 2, 2)), (64, (1, 1, 1)),
    ("maxpool3d", (2, 2, 2)), (128, (1, 1, 1)),
    ("maxpool3d", (2, 2, 2)), (256, (1, 1, 1)),
)

config_maxpool_double = (
    (32, (1, 1, 1)), (32, (1, 1, 1)),
    ("maxpool3d", (2, 2, 2)), (64, (1, 1, 1)), (64, (1, 1, 1)),
    ("maxpool3d", (2, 2, 2)), (128, (1, 1, 1)), (128, (1, 1, 1)),
    ("maxpool3d", (2, 2, 2)), (256, (1, 1, 1)),
)

CONVNET_CONFIGS = {
    "convnet_strides": config_no_maxpool,
    "convnet_maxpool_simple": config_maxpool_simple,
    "convnet_maxpool_double": config_maxpool_double,
}


def convnet_layer_plan(config_name: str, truncate_after: int | None = None):
    """Flat per-layer plan; truncation mirrors base_network.py:76-77."""
    plan = []
    for i, (features, stride) in enumerate(CONVNET_CONFIGS[config_name]):
        if truncate_after is not None and i > truncate_after:
            break
        kind = "maxpool" if features == "maxpool3d" else "conv"
        plan.append(dict(kind=kind, features=features, strides=stride))
    return plan


class ConvNetBackbone(nn.Module):
    feature_layers: Sequence[int] = (6, 9)
    config_name: str = "convnet_maxpool_double"
    dtype: Any = jnp.float32
    init_scheme: str = "torch"
    dropout_rate: float = 0.1  # MONAI Convolution parity default

    @nn.compact
    def __call__(self, x, train: bool = False):
        plan = convnet_layer_plan(self.config_name, max(self.feature_layers))
        wanted = set(self.feature_layers)
        features = {}
        for i, spec in enumerate(plan):
            if spec["kind"] == "maxpool":
                x = max_pool_3d(x, 3, spec["strides"], 1)
            else:
                x = ConvNormActBlock(spec["features"], spec["strides"], dtype=self.dtype,
                                     init_scheme=self.init_scheme,
                                     dropout_rate=self.dropout_rate,
                                     name=f"layer_{i}")(x, train=train)
            if i in wanted:
                features[i] = x
        return features
