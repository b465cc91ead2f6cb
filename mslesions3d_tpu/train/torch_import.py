"""Import reference PyTorch LSSD3D checkpoints into flax params.

Parity harness (SURVEY.md §7.7): maps the reference's state_dict schema
(lesions3d/ssd3d.py LSSD3D with MobileNetBase + PredictionConvolutions) onto
this framework's parameter tree so numerical forward-equivalence can be
diffed, and trained reference checkpoints can be served on TPU.

Reference state_dict schema (torch, NCDHW):
  base.features.0.0.weight                conv_bn stem conv   (O,I,3,3,3)
  base.features.0.1.{weight,bias,running_mean,running_var}   stem BN
  base.features.<i>.conv1.weight          depthwise conv      (C,1,3,3,3)
  base.features.<i>.bn1.*                 depthwise BN
  base.features.<i>.conv2.weight          pointwise conv      (O,C,1,1,1)
  base.features.<i>.bn2.*                 pointwise BN
  pred_convs.loc_convs.<j>.{weight,bias}  loc head            (n_boxes*6,C,3,3,3)
  pred_convs.cl_convs.<j>.{weight,bias}   cls head
  rescale_factors                         (1,C,1,1,1)

Conversions: conv kernels transpose (O,I,kD,kH,kW) -> (kD,kH,kW,I,O);
depthwise kernels (C,1,k,k,k) -> (k,k,k,1,C); BN weight/bias -> scale/bias,
running_mean/var -> batch_stats mean/var.

Accepts either a raw state_dict-like mapping of numpy arrays or a torch
checkpoint file (Lightning .ckpt with "state_dict", or a bare state_dict).
"""

from __future__ import annotations

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # (O, I, kD, kH, kW) -> (kD, kH, kW, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _depthwise_kernel(w: np.ndarray) -> np.ndarray:
    # torch groups=C: (C, 1, k, k, k); flax feature_group_count=C expects
    # (k, k, k, in/groups=1, C)
    return np.transpose(w, (2, 3, 4, 1, 0))


def load_torch_state_dict(path):
    """Load a torch checkpoint file into {name: np.ndarray}."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def convert_torch_state_dict(state: dict, config) -> tuple[dict, dict]:
    """state_dict -> (params, batch_stats) trees matching SSD3D(config)."""
    state = {k: np.asarray(v) for k, v in state.items()}
    params: dict = {"backbone": {}, "heads": {}}
    batch_stats: dict = {"backbone": {}}

    def bn(prefix):
        return (
            {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]},
            {"mean": state[f"{prefix}.running_mean"], "var": state[f"{prefix}.running_var"]},
        )

    # backbone layers
    i = 0
    while f"base.features.{i}.0.weight" in state or f"base.features.{i}.conv1.weight" in state:
        name = f"layer_{i}"
        if f"base.features.{i}.0.weight" in state:  # conv_bn stem
            bn_p, bn_s = bn(f"base.features.{i}.1")
            params["backbone"][name] = {
                "conv": {"kernel": _conv_kernel(state[f"base.features.{i}.0.weight"])},
                "bn": bn_p,
            }
            batch_stats["backbone"][name] = {"bn": bn_s}
        else:  # depthwise-separable Block
            bn1_p, bn1_s = bn(f"base.features.{i}.bn1")
            bn2_p, bn2_s = bn(f"base.features.{i}.bn2")
            params["backbone"][name] = {
                "dw_conv": {"kernel": _depthwise_kernel(state[f"base.features.{i}.conv1.weight"])},
                "dw_bn": bn1_p,
                "pw_conv": {"kernel": _conv_kernel(state[f"base.features.{i}.conv2.weight"])},
                "pw_bn": bn2_p,
            }
            batch_stats["backbone"][name] = {"dw_bn": bn1_s, "pw_bn": bn2_s}
        i += 1

    # prediction heads: convs are ordered by ascending feature layer
    layers = sorted(config.feature_layers)
    for j, layer in enumerate(layers):
        params["heads"][f"loc_{layer}"] = {
            "kernel": _conv_kernel(state[f"pred_convs.loc_convs.{j}.weight"]),
            "bias": state[f"pred_convs.loc_convs.{j}.bias"],
        }
        params["heads"][f"cls_{layer}"] = {
            "kernel": _conv_kernel(state[f"pred_convs.cl_convs.{j}.weight"]),
            "bias": state[f"pred_convs.cl_convs.{j}.bias"],
        }

    if "rescale_factors" in state:
        imported = state["rescale_factors"].reshape(-1)
        from ..models.priors import feature_map_infos

        _, channels = feature_map_infos(
            config.base_network_config, config.input_size,
            config.feature_layers, config.width_mult,
        )
        expected = channels[min(config.feature_layers)]
        if imported.shape[0] == expected:
            params["rescale_factors"] = imported
        else:
            # the reference sizes rescale_factors with a DOUBLE width_mult
            # application (int(int(C*wm)*wm), ssd3d.py:239-241), so for
            # width_mult != 1 the lengths diverge; the param is unused when
            # use_l2_rescale is off (the reference ships it disabled), so
            # keep the framework's init instead of a shape-mismatched import
            import warnings

            warnings.warn(
                f"rescale_factors length {imported.shape[0]} != expected "
                f"{expected} (reference double-applies width_mult); keeping "
                "the framework initialization (param is inert unless "
                "use_l2_rescale)"
            )

    return params, batch_stats


def import_torch_checkpoint(path, config):
    """Torch .ckpt -> (params, batch_stats) for SSD3D(config)."""
    return convert_torch_state_dict(load_torch_state_dict(path), config)
