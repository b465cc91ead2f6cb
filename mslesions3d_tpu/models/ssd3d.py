"""SSD3D: single-shot 3D detector = truncated backbone + per-map prediction heads.

Parity target: reference LSSD3D (lesions3d/ssd3d.py:113-344). Differences by
design (TPU-first):

* channels-last NDHWC; the head's (N, D, H, W, n_boxes*6) output reshapes
  directly to (N, Σpriors, 6) in prior order with no permute/copy;
* shapes and priors come from pure functions (no dummy-tensor probes);
* hyperparameters live in a single hashable config dataclass shared by all
  CLIs and stored inside checkpoints (reference: save_hyperparameters()).

Reference quirks handled:
* `boxes_per_location` ctor arg shadowed by a hard-coded 2 (ssd3d.py:213) —
  here the config value is honored;
* learnable L2-rescale factors are created but disabled in the reference
  forward (ssd3d.py:236-241, 251-254) — reproduced via use_l2_rescale=False
  (param still created for checkpoint-shape parity);
* the head channel count ignores the double width_mult bug (ssd3d.py:130
  would re-scale already-scaled channels; correct behavior is used).
"""

from __future__ import annotations

import dataclasses


import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.nms import detect_objects
from .convnet import ConvNetBackbone
from .mobilenet import MobileNetBackbone
from .priors import default_scales, feature_map_infos, generate_priors

DEFAULT_ASPECT_RATIOS = {3: (1.0,), 5: (1.0,), 7: (1.0,)}  # ssd3d.py:25


def _freeze_ratios(aspect_ratios) -> tuple:
    return tuple(sorted((int(k), tuple(float(r) for r in v)) for k, v in aspect_ratios.items()))


@dataclasses.dataclass(frozen=True)
class SSD3DConfig:
    """Full hyperparameter surface of the reference LSSD3D ctor (ssd3d.py:177-200)."""

    n_classes: int = 2
    input_channels: int = 1
    input_size: tuple[int, int, int] = (64, 64, 64)
    threshold: tuple[float, ...] = (0.5,)  # 1 value = hard matching, 2 = soft band
    alpha: float = 1.0
    lr: float = 1.3e-5
    base_network_config: str = "mobilenet"
    # convnet-backbone dropout (reference hardcodes MONAI's 0.1,
    # lesions3d/base_network.py:83-92); configurable extension
    convnet_dropout: float = 0.1
    width_mult: float = 1.0
    min_score: float = 0.5
    max_overlap: float = 0.5
    min_overlap: float = 0.5
    top_k: int = 100
    scheduler: str = "CosineAnnealingLR"
    t_max: int = 40  # cosine period (reference: per-step, T_max=40)
    batch_size: int = 8
    compute_metric_every_n_epochs: int = 1
    aspect_ratios: tuple = _freeze_ratios(DEFAULT_ASPECT_RATIOS)
    min_object_size: float = 6.0
    max_object_size: float = 14.0
    scales: tuple = ()  # ((layer, scale), ...); empty = linspace default
    boxes_per_location: int = 2
    focal_gamma: float = 0.0  # > 0 switches conf loss to softmax focal
    focal_alpha: float = 0.25
    use_l2_rescale: bool = False
    use_pallas: bool = False  # fused Pallas depthwise kernel at inference
    use_pallas_tail: bool = False  # fuse the WHOLE deep tail in one Pallas program
    remat: bool = False  # jax.checkpoint each backbone block (memory for FLOPs)
    dtype: str = "float32"  # "bfloat16" for TPU hot path
    # "torch" reproduces torch Conv3d/Linear default init (kaiming-uniform
    # weights + uniform-band biases) — part of reference behavior (its init()
    # is a no-op, ssd3d.py:320-331) and measured ~0.11 best-F1 better on the
    # trained-parity study (QUALITY.md). "flax" = lecun_normal + zero biases.
    # "kaiming_relu" = the legacy rounds-1/2 training default (relu-gain
    # kaiming override in train/state.py), kept for run reproducibility.
    init_scheme: str = "torch"
    # exponential moving average of the parameters (0 = off). When > 0 the
    # train step carries a second params tree updated as
    # ema = d*ema + (1-d)*params each step; validation, checkpoint selection
    # and predict then score the EMA weights (framework extension — the
    # reference has no EMA; standard detection practice for noisy small-batch
    # training). Seeded from the init params, so no bias correction needed.
    ema_decay: float = 0.0
    comments: str = ""

    @staticmethod
    def create(aspect_ratios=None, scales=None, threshold=0.5, **kwargs) -> "SSD3DConfig":
        """Ergonomic constructor accepting dicts/floats like the reference ctor."""
        if aspect_ratios:
            kwargs["aspect_ratios"] = _freeze_ratios(aspect_ratios)
        if scales:
            kwargs["scales"] = tuple(sorted((int(k), float(v)) for k, v in scales.items()))
        if isinstance(threshold, (int, float)):
            threshold = (float(threshold),)
        else:
            threshold = tuple(float(t) for t in threshold)
        return SSD3DConfig(threshold=threshold, **kwargs)

    @property
    def aspect_ratios_dict(self) -> dict:
        return {k: list(v) for k, v in self.aspect_ratios}

    @property
    def feature_layers(self) -> tuple:
        return tuple(k for k, _ in self.aspect_ratios)

    @property
    def cube(self) -> bool:
        return self.input_size[0] == self.input_size[1] == self.input_size[2]

    @property
    def scales_dict(self) -> dict:
        if self.scales:
            return dict(self.scales)
        return default_scales(
            self.feature_layers, self.input_size, self.min_object_size, self.max_object_size
        )

    @property
    def soft_matching(self) -> bool:
        return len(self.threshold) == 2

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    def boxes_per_map(self, layer: int) -> int:
        # n_boxes = len(ratios) + boxes_per_location - 1 (ssd3d.py:124)
        return len(dict(self.aspect_ratios)[layer]) + self.boxes_per_location - 1

    def to_json_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["aspect_ratios"] = {str(k): list(v) for k, v in self.aspect_ratios}
        d["scales"] = {str(k): v for k, v in self.scales}
        return d

    @staticmethod
    def from_json_dict(d: dict) -> "SSD3DConfig":
        d = dict(d)
        d["aspect_ratios"] = _freeze_ratios(d["aspect_ratios"])
        d["scales"] = tuple(sorted((int(k), float(v)) for k, v in d.get("scales", {}).items()))
        d["input_size"] = tuple(d["input_size"])
        d["threshold"] = tuple(d["threshold"])
        return SSD3DConfig(**d)


class PredictionHeads(nn.Module):
    """Per-feature-map localization + classification convs (k3, SAME).

    Parity: PredictionConvolutions (ssd3d.py:113-169). NDHWC output reshapes
    straight into prior order.
    """

    config: SSD3DConfig

    @nn.compact
    def __call__(self, features: dict):
        from .layers import bias_init_for, kernel_init_for

        cfg = self.config
        scheme = cfg.init_scheme
        locs, scores = [], []
        for layer in sorted(features.keys()):
            x = features[layer]
            n_boxes = cfg.boxes_per_map(layer)
            batch = x.shape[0]
            fan_in = x.shape[-1] * 27  # C_in * 3^3 (torch bias-band fan-in)
            # stride-1 k3: (1,1) padding == SAME; explicit for torch parity
            loc = nn.Conv(n_boxes * 6, kernel_size=(3, 3, 3),
                          padding=((1, 1), (1, 1), (1, 1)),
                          dtype=cfg.compute_dtype,
                          kernel_init=kernel_init_for(scheme),
                          bias_init=bias_init_for(scheme, fan_in),
                          name=f"loc_{layer}")(x)
            cls = nn.Conv(n_boxes * cfg.n_classes, kernel_size=(3, 3, 3),
                          padding=((1, 1), (1, 1), (1, 1)),
                          dtype=cfg.compute_dtype,
                          kernel_init=kernel_init_for(scheme),
                          bias_init=bias_init_for(scheme, fan_in),
                          name=f"cls_{layer}")(x)
            locs.append(loc.reshape(batch, -1, 6))
            scores.append(cls.reshape(batch, -1, cfg.n_classes))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(scores, axis=1)


class SSD3D(nn.Module):
    """Backbone + heads; returns (locs (N,P,6), class scores (N,P,C))."""

    config: SSD3DConfig

    def setup(self):
        cfg = self.config
        if "mobilenet" in cfg.base_network_config:
            self.backbone = MobileNetBackbone(
                feature_layers=cfg.feature_layers,
                config_name=cfg.base_network_config,
                width_mult=cfg.width_mult,
                cube=cfg.cube,
                dtype=cfg.compute_dtype,
                use_pallas=cfg.use_pallas,
                use_pallas_tail=cfg.use_pallas_tail,
                remat=cfg.remat,
                init_scheme=cfg.init_scheme,
            )
        elif "convnet" in cfg.base_network_config:
            self.backbone = ConvNetBackbone(
                feature_layers=cfg.feature_layers,
                config_name=cfg.base_network_config,
                dtype=cfg.compute_dtype,
                init_scheme=cfg.init_scheme,
                dropout_rate=cfg.convnet_dropout,
            )
        else:
            raise ValueError(
                "Unknown base network name. Expected 'mobilenet*' or 'convnet*' "
                f"but got {cfg.base_network_config!r}"
            )
        self.heads = PredictionHeads(cfg)
        # Learnable L2 rescale of the shallowest map — created for checkpoint
        # parity, disabled by default exactly like the reference (ssd3d.py:251-254).
        _, channels = feature_map_infos(
            cfg.base_network_config, cfg.input_size, cfg.feature_layers, cfg.width_mult
        )
        self.rescale_factors = self.param(
            "rescale_factors",
            nn.initializers.constant(20.0),
            (channels[min(cfg.feature_layers)],),
        )

    def __call__(self, images, train: bool = False):
        cfg = self.config
        images = images.astype(cfg.compute_dtype)
        features = self.backbone(images, train=train)

        first = min(features.keys())
        if cfg.use_l2_rescale:
            rescale = self.rescale_factors
            x = features[first].astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + 1e-6
            features = dict(features)
            features[first] = ((x / norm) * rescale).astype(cfg.compute_dtype)

        return self.heads(features)


def build_model(config: SSD3DConfig) -> SSD3D:
    return SSD3D(config)


def model_priors(config: SSD3DConfig) -> np.ndarray:
    """Prior boxes for a config, center form (P, 6). Pure function of config."""
    fmap_dims, _ = feature_map_infos(
        config.base_network_config, config.input_size, config.feature_layers, config.width_mult
    )
    return generate_priors(
        {k: fmap_dims[k] for k in config.feature_layers},
        config.scales_dict,
        config.aspect_ratios_dict,
        config.boxes_per_location,
    )


def detect(config: SSD3DConfig, predicted_locs, predicted_scores, priors_center,
           min_score=None, max_overlap=None, top_k=None):
    """decode + NMS + top-k with config defaults (ssd3d.py:344-460)."""
    return detect_objects(
        predicted_locs,
        predicted_scores,
        jnp.asarray(priors_center),
        n_classes=config.n_classes,
        min_score=config.min_score if min_score is None else min_score,
        max_overlap=config.max_overlap if max_overlap is None else max_overlap,
        top_k=config.top_k if top_k is None else top_k,
    )
