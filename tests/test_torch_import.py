"""Numerical forward-equivalence: reference-schema torch model vs flax SSD3D.

Builds an independent torch mirror of the reference architecture (NCDHW
MobileNet-SSD, written from the documented layer schema), converts its
state_dict with train.torch_import, and asserts the flax NDHWC forward
matches the torch forward numerically in eval mode. This is the checkpoint
parity harness of SURVEY.md §7.7.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
from mslesions3d_tpu.train.torch_import import convert_torch_state_dict

INPUT = (32, 32, 32)
LAYERS = (3, 5, 7)


def torch_conv_bn(inp, oup, stride):
    return nn.Sequential(
        nn.Conv3d(inp, oup, 3, stride=stride, padding=1, bias=False),
        nn.BatchNorm3d(oup),
        nn.ReLU(inplace=True),
    )


class TorchBlock(nn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.conv1 = nn.Conv3d(inp, inp, 3, stride=stride, padding=1, groups=inp, bias=False)
        self.bn1 = nn.BatchNorm3d(inp)
        self.conv2 = nn.Conv3d(inp, oup, 1, bias=False)
        self.bn2 = nn.BatchNorm3d(oup)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        return torch.relu(self.bn2(self.conv2(x)))


class TorchMirror(nn.Module):
    """NCDHW mirror with the reference's state_dict key layout."""

    def __init__(self, n_classes=2, in_channels=1):
        super().__init__()
        # 32^3 cube input -> first stride (2,2,2); truncate after layer 7
        plan = [(32, 2)] + [(64, 2), (128, 2), (128, 1), (256, 2), (256, 1),
                            (512, 2), (512, 1)]
        feats = [torch_conv_bn(in_channels, 32, 2)]
        cin = 32
        for cout, s in plan[1:]:
            feats.append(TorchBlock(cin, cout, s))
            cin = cout
        self.base = nn.Module()
        self.base.features = nn.Sequential(*feats)

        channels = {3: 128, 5: 256, 7: 512}
        self.pred_convs = nn.Module()
        self.pred_convs.loc_convs = nn.ModuleList(
            [nn.Conv3d(channels[l], 2 * 6, 3, padding=1) for l in LAYERS]
        )
        self.pred_convs.cl_convs = nn.ModuleList(
            [nn.Conv3d(channels[l], 2 * n_classes, 3, padding=1) for l in LAYERS]
        )
        self.n_classes = n_classes

    def forward(self, x):
        feats = {}
        out = x
        for i, f in enumerate(self.base.features):
            out = f(out)
            if i in LAYERS:
                feats[i] = out
        locs, scores = [], []
        for j, l in enumerate(sorted(feats)):
            lc = self.pred_convs.loc_convs[j](feats[l])
            lc = lc.permute(0, 2, 3, 4, 1).contiguous().view(x.shape[0], -1, 6)
            sc = self.pred_convs.cl_convs[j](feats[l])
            sc = sc.permute(0, 2, 3, 4, 1).contiguous().view(x.shape[0], -1, self.n_classes)
            locs.append(lc)
            scores.append(sc)
        return torch.cat(locs, 1), torch.cat(scores, 1)


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    tm = TorchMirror()
    tm.eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = SSD3DConfig.create(n_classes=2, input_channels=1, input_size=INPUT)
    params, batch_stats = convert_torch_state_dict(state, cfg)
    return tm, cfg, params, batch_stats


def test_forward_equivalence(converted):
    tm, cfg, params, batch_stats = converted
    model = SSD3D(cfg)

    # graft converted params into a template (keeps rescale_factors default)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *INPUT, 1)), train=False)
    merged_params = dict(template["params"])
    merged_params["backbone"] = params["backbone"]
    merged_params["heads"] = params["heads"]

    x = np.random.default_rng(3).normal(size=(2, 1, *INPUT)).astype(np.float32)
    with torch.no_grad():
        t_locs, t_scores = tm(torch.tensor(x))

    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NCDHW -> NDHWC
    j_locs, j_scores = model.apply(
        {"params": merged_params, "batch_stats": batch_stats}, x_jax, train=False
    )

    assert j_locs.shape == tuple(t_locs.shape) == (2, model_priors(cfg).shape[0], 6)
    # guard against vacuous parity: outputs must carry input-dependent signal
    # (not just head biases) — a padding/wiring bug once hid behind collapsed
    # activations here
    assert float(t_locs.std()) > 0.01
    assert float((t_locs[0] - t_locs[1]).abs().max()) > 1e-4
    np.testing.assert_allclose(np.asarray(j_locs), t_locs.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_scores), t_scores.numpy(), rtol=1e-4, atol=1e-5)

    # intermediate-layer parity: the stride-2 stem is where XLA SAME padding
    # (0,1) would diverge from torch padding (1,1)
    feats_j = model.apply(
        {"params": merged_params, "batch_stats": batch_stats},
        x_jax, train=False, method=lambda m, xx, train: m.backbone(xx, train=train),
    )
    with torch.no_grad():
        t3 = torch.tensor(x)
        for i, f in enumerate(tm.base.features):
            t3 = f(t3)
            if i == 3:
                break
    l3 = np.transpose(np.asarray(feats_j[3]), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(l3, t3.numpy(), rtol=1e-4, atol=1e-5)


def test_converted_tree_structure(converted):
    _, cfg, params, batch_stats = converted
    model = SSD3D(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *INPUT, 1)), train=False)

    def shapes(tree):
        return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tree)

    assert shapes(params["backbone"]) == shapes(template["params"]["backbone"])
    assert shapes(params["heads"]) == shapes(template["params"]["heads"])
    assert shapes(batch_stats["backbone"]) == shapes(template["batch_stats"]["backbone"])


def test_import_torch_cli(converted, tmp_path):
    """Torch .ckpt file -> framework checkpoint dir -> loadable + usable."""
    import torch as _torch

    from mslesions3d_tpu.cli import import_torch as cli
    from mslesions3d_tpu.train.checkpoints import load_checkpoint

    tm, cfg, _, _ = converted
    ckpt_file = tmp_path / "ref.ckpt"
    _torch.save({"state_dict": tm.state_dict()}, ckpt_file)

    out = cli.main([
        "-m", str(ckpt_file), "-o", str(tmp_path / "conv"),
        "--input_size", "32", "32", "32",
    ])
    config, payload, meta = load_checkpoint(out)
    assert meta["extra"]["imported_from"] == str(ckpt_file)
    assert config.input_size == (32, 32, 32)

    # forward through the imported checkpoint matches the torch mirror
    model = SSD3D(config)
    x = np.random.default_rng(0).normal(size=(1, 1, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_locs, _ = tm(torch.tensor(x))
    j_locs, _ = model.apply(
        {"params": payload["params"], "batch_stats": payload["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))), train=False,
    )
    np.testing.assert_allclose(np.asarray(j_locs), t_locs.numpy(), rtol=1e-4, atol=1e-5)


def test_rescale_factors_length_mismatch_skipped(converted):
    """Reference double-applies width_mult to rescale_factors
    (ssd3d.py:239-241); a mismatched length must be skipped with a warning,
    not imported into a broken checkpoint (round-1 advisor finding)."""
    tm, cfg, _, _ = converted
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    import numpy as np

    state["rescale_factors"] = np.full((7,), 20.0, np.float32)  # wrong length
    with pytest.warns(UserWarning, match="rescale_factors length"):
        params, _ = convert_torch_state_dict(state, cfg)
    assert "rescale_factors" not in params

    # a correctly-sized import passes through
    from mslesions3d_tpu.models.priors import feature_map_infos

    _, channels = feature_map_infos(
        cfg.base_network_config, cfg.input_size, cfg.feature_layers, cfg.width_mult
    )
    state["rescale_factors"] = np.full(
        (channels[min(cfg.feature_layers)],), 20.0, np.float32
    )
    params, _ = convert_torch_state_dict(state, cfg)
    assert params["rescale_factors"].shape == (channels[min(cfg.feature_layers)],)
