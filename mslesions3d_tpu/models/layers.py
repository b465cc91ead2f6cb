"""Building-block layers for 3D conv backbones (flax.linen, channels-last).

TPU-first design notes
----------------------
* Layout is NDHWC everywhere: the channel axis lands on the 128-wide lane
  dimension, so pointwise (1x1x1) convs compile to plain MXU matmuls and
  depthwise convs vectorize on the VPU. (The reference is NCDHW torch/cuDNN;
  lesions3d/mobilenet.py:26-49.)
* Depthwise separable conv uses ``feature_group_count`` — XLA lowers this to
  a fused depthwise op; the pointwise half is a (D*H*W, C_in) x (C_in, C_out)
  matmul that dominates FLOPs and maps directly onto the MXU.
* Compute dtype is configurable (bf16 for TPU speed-of-light); BatchNorm
  statistics stay fp32. Under jit-with-shardings the batch statistics are
  global-batch statistics automatically (XLA inserts the collectives), which
  gives synchronized BN across data-parallel shards for free.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _triple(v) -> tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(v)


def torch_kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch Conv3d/Linear default weight init, in flax kernel layout.

    torch's ``kaiming_uniform_(a=sqrt(5))`` reduces to
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = C_in/groups * prod(k)
    — which in flax layout ((k..., C_in/groups, C_out) for convs,
    (in, out) for dense) is exactly prod(shape[:-1]).

    Measured to matter: the trained-parity study (QUALITY.md) shows the
    reference recipe lands at best-F1 0.507 from this init vs 0.394 from
    the legacy relu-gain kaiming + zero-bias scheme — torch init IS part of
    reference behavior (reference LSSD3D.init() is a no-op over bare convs,
    so torch constructor defaults apply; ssd3d.py:320-331).
    """
    import numpy as _np

    fan_in = int(_np.prod(shape[:-1]))
    bound = 1.0 / _np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_uniform(fan_in: int):
    """torch Conv/Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    import numpy as _np

    bound = 1.0 / _np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kernel_init_for(scheme: str):
    """Conv/dense kernel initializer for an init scheme ("torch" | "flax")."""
    if scheme == "torch":
        return torch_kaiming_uniform
    return nn.initializers.lecun_normal()


def bias_init_for(scheme: str, fan_in: int):
    """Bias initializer: torch uniform band, or flax zeros."""
    if scheme == "torch":
        return torch_bias_uniform(fan_in)
    return nn.initializers.zeros


class ConvParams(nn.Module):
    """Bare conv-kernel parameter holder (variable path <name>/kernel)."""

    shape: tuple
    init_scheme: str = "torch"

    def setup(self):
        self.kernel = self.param("kernel", kernel_init_for(self.init_scheme), self.shape)


class BatchNorm3d(nn.Module):
    """BatchNorm over (N, D, H, W) with flax-compatible variable layout.

    Same params (scale, bias) / batch_stats (mean, var) tree and numerics as
    flax.linen.BatchNorm(momentum=0.9, eps=1e-5), plus a ``folded()``
    accessor returning the inference affine for fused kernels.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))
        self.mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        self.var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

    def __call__(self, x, train: bool = False):
        dtype_in = x.dtype
        x32 = x.astype(jnp.float32)
        if train:
            batch_mean = jnp.mean(x32, axis=(0, 1, 2, 3))
            batch_var = jnp.var(x32, axis=(0, 1, 2, 3))
            if not self.is_initializing():
                self.mean.value = (
                    self.momentum * self.mean.value + (1 - self.momentum) * batch_mean
                )
                self.var.value = (
                    self.momentum * self.var.value + (1 - self.momentum) * batch_var
                )
            mean, var = batch_mean, batch_var
        else:
            mean, var = self.mean.value, self.var.value
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * self.scale + self.bias
        return y.astype(dtype_in)

    def folded(self):
        """(gamma, beta) of the inference-time affine (running stats)."""
        gamma = self.scale * jax.lax.rsqrt(self.var.value + self.epsilon)
        beta = self.bias - self.mean.value * gamma
        return gamma, beta


class ConvBNReLU(nn.Module):
    """Conv3d(k3, stride, p1, no bias) + BatchNorm + ReLU.

    Parity: reference ``conv_bn`` (lesions3d/mobilenet.py:26-31).
    """

    features: int
    strides: Sequence[int] | int = 1
    kernel_size: Sequence[int] | int = 3
    dtype: Dtype = jnp.float32
    init_scheme: str = "torch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _triple(self.kernel_size)
        x = nn.Conv(
            self.features,
            kernel_size=k,
            strides=_triple(self.strides),
            # explicit torch-style symmetric padding: XLA "SAME" pads (0, 1)
            # at stride 2 on even dims, sampling different window positions
            # than torch Conv3d(padding=1) — breaks checkpoint import parity
            padding=tuple((ki // 2, ki // 2) for ki in k),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=kernel_init_for(self.init_scheme),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x).astype(self.dtype)


class DepthwiseSeparableBlock(nn.Module):
    """Depthwise 3x3x3 conv + BN + ReLU, then pointwise 1x1x1 conv + BN + ReLU.

    Parity: reference ``Block`` (lesions3d/mobilenet.py:34-49). The NaN guard
    there is a debugging aid, not behavior; numerical health is asserted in
    tests instead.

    ``use_pallas`` switches the depthwise+BN+ReLU half to the fused Pallas
    TPU kernel at inference time (stride-1, lane-aligned channels only; the
    variable tree is identical either way, so the flag can be flipped on any
    checkpoint).
    """

    features: int
    strides: Sequence[int] | int = 1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    init_scheme: str = "torch"

    @nn.compact
    def __call__(self, x, train: bool = False, collect_folded: bool = False):
        from ..kernels.depthwise import fused_depthwise_bn_relu

        in_features = x.shape[-1]
        strides = _triple(self.strides)
        dw_conv = ConvParams((3, 3, 3, 1, in_features),
                             init_scheme=self.init_scheme, name="dw_conv")
        dw_bn = BatchNorm3d(in_features, name="dw_bn")
        pw_conv = ConvParams((1, 1, 1, in_features, self.features),
                             init_scheme=self.init_scheme, name="pw_conv")
        pw_bn = BatchNorm3d(self.features, name="pw_bn")

        if collect_folded:
            # folded inference params for the fused tail kernel
            # (kernels/tail.py) — declares the SAME variables as the
            # compute path, so checkpoints are interchangeable
            dw_gamma, dw_beta = dw_bn.folded()
            pw_gamma, pw_beta = pw_bn.folded()
            return {
                "dw_w": dw_conv.kernel.reshape(3, 3, 3, in_features),
                "dw_gamma": dw_gamma, "dw_beta": dw_beta,
                "pw_w": pw_conv.kernel.reshape(in_features, self.features),
                "pw_gamma": pw_gamma, "pw_beta": pw_beta,
                "stride": strides[0],
            }

        pallas_eligible = (
            self.use_pallas
            and not train
            and strides == (1, 1, 1)
            and in_features % 128 == 0
        )
        if pallas_eligible:
            gamma, beta = dw_bn.folded()
            x = fused_depthwise_bn_relu(
                x.astype(self.dtype),
                dw_conv.kernel.reshape(3, 3, 3, in_features).astype(self.dtype),
                gamma, beta,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                dw_conv.kernel.astype(self.dtype),
                window_strides=strides,
                padding=((1, 1), (1, 1), (1, 1)),  # torch-parity (see stem conv)
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=in_features,
            )
            x = dw_bn(x, train=train)
            x = nn.relu(x).astype(self.dtype)
        # pointwise conv as a bare-kernel lax.conv (identical variable
        # path/shape/init to the former nn.Conv) + our BatchNorm3d
        # (identical tree + numerics to nn.BatchNorm): both halves of the
        # block now expose folded params for the fused tail kernel
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            pw_conv.kernel.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        x = pw_bn(x, train=train)
        return nn.relu(x).astype(self.dtype)


class ConvNormActBlock(nn.Module):
    """Conv3d + InstanceNorm + Dropout + PReLU ("NDA" ordering).

    Parity: the MONAI ``Convolution`` block as configured by the reference
    convnet backbone (lesions3d/base_network.py:83-92): PReLU init 0.2,
    dropout 0.1, norm-dropout-activation order.
    """

    features: int
    strides: Sequence[int] | int = 1
    dropout_rate: float = 0.1
    prelu_init: float = 0.2
    dtype: Dtype = jnp.float32
    init_scheme: str = "torch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            strides=_triple(self.strides),
            padding=((1, 1), (1, 1), (1, 1)),  # torch-parity (see stem conv)
            use_bias=True,
            dtype=self.dtype,
            kernel_init=kernel_init_for(self.init_scheme),
            bias_init=bias_init_for(self.init_scheme, x.shape[-1] * 27),
            name="conv",
        )(x)
        # Instance norm: per-sample, per-channel normalization over D,H,W.
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x32, axis=(1, 2, 3), keepdims=True)
        x = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(self.dtype)
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        alpha = self.param("prelu_alpha", nn.initializers.constant(self.prelu_init), (1,))
        return jnp.where(x >= 0, x, alpha.astype(self.dtype) * x)


def max_pool_3d(x, kernel_size=3, strides=2, padding=1):
    """MaxPool3d(k3, s2, p1) parity (lesions3d/base_network.py:79-81)."""
    k = _triple(kernel_size)
    s = _triple(strides)
    p = _triple(padding)
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, *k, 1),
        window_strides=(1, *s, 1),
        padding=((0, 0), *((pi, pi) for pi in p), (0, 0)),
    )
