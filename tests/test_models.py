"""Model-level tests: analytic shape inference, prior generation parity with a
loop-reference, SSD3D forward shapes, and multibox loss vs a numpy mirror."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mslesions3d_tpu.models import (
    SSD3D,
    SSD3DConfig,
    feature_map_infos,
    generate_priors,
    model_priors,
    multibox_loss,
)
from mslesions3d_tpu.models.priors import default_scales
from mslesions3d_tpu.ops.boxes import center_to_corner, corner_to_center, encode_boxes
from tests.test_matching import reference_match


def test_feature_map_infos_mobilenet_64():
    """Reference-derived shapes for 64^3 (SURVEY.md §3.2 / ssd3d.py:37-45)."""
    dims, channels = feature_map_infos("mobilenet", (64, 64, 64), (3, 5, 7))
    assert dims == {0: (32,) * 3, 1: (16,) * 3, 2: (8,) * 3, 3: (8,) * 3,
                    4: (4,) * 3, 5: (4,) * 3, 6: (2,) * 3, 7: (2,) * 3}
    assert channels == {0: 32, 1: 64, 2: 128, 3: 128, 4: 256, 5: 256, 6: 512, 7: 512}


def test_feature_map_infos_noncube_first_stride():
    dims, _ = feature_map_infos("mobilenet", (250, 300, 300), (3, 5, 7))
    # non-cube input uses first stride (1,2,2) (ssd3d.py:60)
    assert dims[0] == (250, 150, 150)


def test_feature_map_infos_convnet():
    dims, channels = feature_map_infos("convnet_maxpool_double", (64, 64, 64), (6, 9))
    assert dims[6] == (16, 16, 16) and channels[6] == 128
    assert dims[9] == (8, 8, 8) and channels[9] == 256


def test_prior_count_1168():
    """Headline parity number: 64^3 / layers {3,5,7} / bpl=2 -> 1168 priors."""
    cfg = SSD3DConfig.create(n_classes=2, input_channels=1, input_size=(64, 64, 64))
    priors = model_priors(cfg)
    assert priors.shape == (1168, 6)
    assert priors.min() >= 0.0 and priors.max() <= 1.0


def test_default_scales_linspace():
    scales = default_scales((3, 5, 7), (64, 64, 64), 6, 14)
    np.testing.assert_allclose(
        [scales[3], scales[5], scales[7]], [6 / 64, 10 / 64, 14 / 64], rtol=1e-6
    )


def reference_prior_loop(fmap_dims, scales, aspect_ratios, boxes_per_location):
    """Triple-loop prior generator mirroring ssd3d.py:286-342 semantics."""
    prior_boxes = []
    for fmap in sorted(aspect_ratios.keys()):
        d0, d1, d2 = fmap_dims[fmap]
        s = scales[fmap]
        for i in range(d0):
            for j in range(d1):
                for k in range(d2):
                    cz = (k + 0.5) / d2
                    cx = (j + 0.5) / d1
                    cy = (i + 0.5) / d0
                    for ratio in aspect_ratios[fmap]:
                        prior_boxes.append([cx, cy, cz, s, s, s])
                        if ratio == 1.0:
                            for div in range(1, boxes_per_location):
                                a = s + s / div
                                prior_boxes.append([cx, cy, cz, a, a, a])
    return np.clip(np.asarray(prior_boxes, np.float32), 0, 1)


def test_prior_order_parity():
    fmap_dims = {3: (4, 4, 4), 5: (2, 2, 2), 7: (1, 1, 1)}
    scales = {3: 0.09375, 5: 0.15625, 7: 0.21875}
    ars = {3: [1.0], 5: [1.0], 7: [1.0]}
    got = generate_priors(fmap_dims, scales, ars, 2)
    expected = reference_prior_loop(fmap_dims, scales, ars, 2)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_prior_order_parity_bpl3_noncube_fmap():
    fmap_dims = {2: (3, 4, 5)}
    scales = {2: 0.2}
    ars = {2: [1.0]}
    got = generate_priors(fmap_dims, scales, ars, 3)
    expected = reference_prior_loop(fmap_dims, scales, ars, 3)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@pytest.fixture(scope="module")
def small_model():
    cfg = SSD3DConfig.create(n_classes=2, input_channels=1, input_size=(32, 32, 32))
    model = SSD3D(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init(rng, x, train=False)
    return cfg, model, variables


def test_ssd3d_forward_shapes(small_model):
    cfg, model, variables = small_model
    priors = model_priors(cfg)
    assert priors.shape[0] == 2 * (4**3 + 2**3 + 1)  # 146

    x = jnp.ones((2, 32, 32, 32, 1))
    locs, scores = model.apply(variables, x, train=False)
    assert locs.shape == (2, priors.shape[0], 6)
    assert scores.shape == (2, priors.shape[0], 2)
    assert np.isfinite(np.asarray(locs)).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_ssd3d_train_mode_updates_batch_stats(small_model):
    cfg, model, variables = small_model
    x = jnp.ones((1, 32, 32, 32, 1))
    (locs, scores), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )


def test_convnet_forward():
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32),
        base_network_config="convnet_maxpool_double",
        aspect_ratios={6: [1.0], 9: [1.0]},
    )
    model = SSD3D(cfg)
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    locs, scores = model.apply(
        variables, x, train=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    priors = model_priors(cfg)
    assert priors.shape[0] == 2 * (8**3 + 4**3)
    assert locs.shape == (1, priors.shape[0], 6)


def np_multibox_loss(locs, logits, boxes, labels, priors_center, thr):
    """Numpy mirror of reference MultiBoxLoss (unchunked)."""
    B, P, C = logits.shape
    priors_corner = np.asarray(center_to_corner(jnp.asarray(priors_center)))
    true_locs = np.zeros((B, P, 6), np.float32)
    true_classes = np.zeros((B, P), np.int64)
    for b in range(B):
        if boxes[b].shape[0] == 0:
            continue
        obj_for_prior, lbl = reference_match(boxes[b], labels[b], priors_corner, thr)
        true_classes[b] = lbl
        matched = boxes[b][obj_for_prior]
        true_locs[b] = np.asarray(
            encode_boxes(corner_to_center(jnp.asarray(matched)), jnp.asarray(priors_center))
        )
    positive = true_classes > 0
    n_pos = positive.sum()
    loc_loss = np.abs(locs - true_locs)[positive].mean()

    z = logits - logits.max(-1, keepdims=True)
    log_probs = z - np.log(np.exp(z).sum(-1, keepdims=True))
    ce = -np.take_along_axis(log_probs, true_classes[..., None], -1)[..., 0]
    conf_loss = ce.sum() / n_pos
    return conf_loss, loc_loss


def test_multibox_loss_parity():
    rng = np.random.default_rng(5)
    P, B, M, C = 80, 2, 3, 2
    centers = rng.uniform(0.2, 0.8, (P, 3))
    sizes = rng.uniform(0.1, 0.3, (P, 3))
    priors = np.concatenate([centers, sizes], 1).astype(np.float32)

    lo = rng.uniform(0.1, 0.5, (B, M, 3))
    hi = lo + rng.uniform(0.1, 0.4, (B, M, 3))
    gt_boxes = np.concatenate([lo, np.minimum(hi, 1)], -1).astype(np.float32)
    gt_labels = np.ones((B, M), np.int32)
    gt_mask = np.ones((B, M), bool)

    locs = rng.normal(0, 1, (B, P, 6)).astype(np.float32)
    logits = rng.normal(0, 1, (B, P, C)).astype(np.float32)

    conf, loc = multibox_loss(
        jnp.asarray(locs), jnp.asarray(logits), jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels), jnp.asarray(gt_mask), jnp.asarray(priors), 0.5,
    )
    exp_conf, exp_loc = np_multibox_loss(
        locs, logits, [b for b in gt_boxes], [l for l in gt_labels], priors, 0.5
    )
    np.testing.assert_allclose(float(conf), exp_conf, rtol=1e-4)
    np.testing.assert_allclose(float(loc), exp_loc, rtol=1e-3, atol=1e-5)


def test_multibox_loss_grad_finite():
    rng = np.random.default_rng(9)
    P, B, M, C = 40, 1, 2, 2
    priors = np.concatenate(
        [rng.uniform(0.3, 0.7, (P, 3)), rng.uniform(0.1, 0.3, (P, 3))], 1
    ).astype(np.float32)
    lo = rng.uniform(0.2, 0.5, (B, M, 3))
    gt_boxes = np.concatenate([lo, lo + 0.2], -1).astype(np.float32)
    gt_labels = np.ones((B, M), np.int32)
    gt_mask = np.array([[True, False]])

    def loss_fn(locs, logits):
        c, l = multibox_loss(
            locs, logits, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_mask), jnp.asarray(priors), 0.5,
        )
        return c + l

    locs = jnp.zeros((B, P, 6))
    logits = jnp.zeros((B, P, C))
    grads = jax.grad(loss_fn, argnums=(0, 1))(locs, logits)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_multibox_loss_hard_negative_mining_reduces_conf():
    rng = np.random.default_rng(3)
    P, B, M, C = 60, 1, 2, 2
    priors = np.concatenate(
        [rng.uniform(0.3, 0.7, (P, 3)), rng.uniform(0.1, 0.3, (P, 3))], 1
    ).astype(np.float32)
    lo = rng.uniform(0.2, 0.5, (B, M, 3))
    gt_boxes = np.concatenate([lo, lo + 0.25], -1).astype(np.float32)
    gt_labels = np.ones((B, M), np.int32)
    gt_mask = np.ones((B, M), bool)
    locs = jnp.zeros((B, P, 6))
    logits = jnp.asarray(rng.normal(0, 1, (B, P, C)).astype(np.float32))

    conf_all, _ = multibox_loss(
        locs, logits, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), jnp.asarray(priors), 0.5,
    )
    conf_mined, _ = multibox_loss(
        locs, logits, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), jnp.asarray(priors), 0.5, hard_negative_mining=True,
    )
    assert float(conf_mined) <= float(conf_all)


def test_mobilenet_classifier():
    """C8 parity: full MobileNet-3D classifier (avg-pool + dropout + linear)."""
    from mslesions3d_tpu.models import MobileNetClassifier

    model = MobileNetClassifier(num_classes=3, width_mult=0.25)
    x = jnp.zeros((1, 32, 48, 48, 1))  # non-cube -> first stride (1,2,2)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out.shape == (1, 3)
    out_t, _ = jax.jit(
        lambda v, x, k: model.apply(
            v, x, train=True, mutable=["batch_stats"], rngs={"dropout": k})
    )(variables, x, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out_t)).all()


def test_priors_per_feature_map_concat_equals_flat():
    from mslesions3d_tpu.models.priors import priors_per_feature_map

    fmap_dims = {3: (4, 4, 4), 5: (2, 2, 2)}
    scales = {3: 0.1, 5: 0.2}
    ars = {3: [1.0], 5: [1.0]}
    per_map = priors_per_feature_map(fmap_dims, scales, ars, 2)
    flat = generate_priors(fmap_dims, scales, ars, 2)
    np.testing.assert_allclose(
        np.concatenate([per_map[3], per_map[5]]), flat, rtol=1e-6
    )


def test_remat_equivalence():
    """remat=True is numerically identical and keeps gradients finite."""
    base = dict(n_classes=2, input_channels=1, input_size=(16, 16, 16), width_mult=0.25)
    cfg = SSD3DConfig.create(**base)
    cfg_r = SSD3DConfig.create(**base, remat=True)
    model, model_r = SSD3D(cfg), SSD3D(cfg_r)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    # apply/grad jitted: eager mode re-dispatches op-by-op every run, while
    # the jitted programs replay from the persistent compile cache. The INIT
    # stays eager: cache-replayed init executables trigger a heap-corruption
    # abort later in the suite (see train/state.py::create_train_state note).
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    out_r = jax.jit(lambda v, x: model_r.apply(v, x, train=False))(variables, x)
    np.testing.assert_allclose(np.asarray(out_r[0]), np.asarray(out[0]), rtol=1e-5)

    def loss(params):
        locs, scores = model_r.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x, train=False
        )
        return jnp.sum(locs ** 2) + jnp.sum(scores ** 2)

    grads = jax.jit(jax.grad(loss))(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_focal_loss_option():
    rng = np.random.default_rng(11)
    P, B, M = 60, 1, 2
    priors = np.concatenate(
        [rng.uniform(0.3, 0.7, (P, 3)), rng.uniform(0.1, 0.3, (P, 3))], 1
    ).astype(np.float32)
    lo = rng.uniform(0.2, 0.5, (B, M, 3))
    gt_boxes = np.concatenate([lo, lo + 0.25], -1).astype(np.float32)
    gt_labels = np.ones((B, M), np.int32)
    gt_mask = np.ones((B, M), bool)
    locs = jnp.zeros((B, P, 6))
    logits = jnp.asarray(rng.normal(0, 1, (B, P, 2)).astype(np.float32))

    conf_ce, _ = multibox_loss(
        locs, logits, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), jnp.asarray(priors), 0.5,
    )
    conf_focal, _ = multibox_loss(
        locs, logits, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), jnp.asarray(priors), 0.5, focal_gamma=2.0,
    )
    # focal downweights easy examples -> strictly smaller than plain CE here
    assert 0 < float(conf_focal) < float(conf_ce)
    g = jax.grad(lambda l: multibox_loss(
        locs, l, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), jnp.asarray(priors), 0.5, focal_gamma=2.0,
    )[0])(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_focal_wired_through_config():
    from mslesions3d_tpu.models.losses import multibox_loss_from_config

    rng = np.random.default_rng(7)
    P, B, M = 40, 1, 1
    priors = np.concatenate(
        [rng.uniform(0.3, 0.7, (P, 3)), rng.uniform(0.1, 0.3, (P, 3))], 1
    ).astype(np.float32)
    lo = rng.uniform(0.2, 0.5, (B, M, 3))
    gt = np.concatenate([lo, lo + 0.3], -1).astype(np.float32)
    args = (jnp.zeros((B, P, 6)), jnp.asarray(rng.normal(0, 1, (B, P, 2)), jnp.float32),
            jnp.asarray(gt), jnp.ones((B, M), jnp.int32), jnp.ones((B, M), bool),
            jnp.asarray(priors))

    cfg_plain = SSD3DConfig.create(threshold=0.5)
    cfg_focal = SSD3DConfig.create(threshold=0.5, focal_gamma=2.0)
    conf_plain, _ = multibox_loss_from_config(cfg_plain, *args)
    conf_focal, _ = multibox_loss_from_config(cfg_focal, *args)
    assert float(conf_focal) != float(conf_plain)


def test_init_scheme_torch_matches_torch_defaults():
    """init_scheme="torch" reproduces torch Conv3d default init statistics.

    torch Conv3d: weight ~ kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in)),
    bias ~ U(+-1/sqrt(fan_in)), fan_in = C_in/groups * 27. Checked against a
    real torch layer's empirical bounds/std, not constants, so the test
    survives torch changing its defaults.
    """
    import jax
    import numpy as np
    import torch

    from mslesions3d_tpu.models import SSD3D, SSD3DConfig

    cfg = SSD3DConfig.create(n_classes=2, input_channels=1,
                             input_size=(32, 32, 32), init_scheme="torch")
    model = SSD3D(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 32, 1), np.float32),
        train=False)
    params = variables["params"]

    # stem conv kernel (3,3,3,1,32): fan_in = 27
    stem = np.asarray(params["backbone"]["layer_0"]["conv"]["kernel"])
    t = torch.nn.Conv3d(1, 32, 3, bias=True)
    t_w = t.weight.detach().numpy()
    bound = 1 / np.sqrt(27)
    assert abs(stem).max() <= bound + 1e-7
    assert abs(t_w).max() <= bound + 1e-7  # same analytic band as torch
    assert np.isclose(stem.std(), t_w.std(), rtol=0.15)
    assert abs(stem.mean()) < 0.02

    # head bias band: fan_in = C_in * 27 (reference head convs carry bias)
    head = params["heads"]["loc_3"]
    cin = params["heads"]["loc_3"]["kernel"].shape[3]
    b = np.asarray(head["bias"])
    bb = 1 / np.sqrt(cin * 27)
    assert abs(b).max() <= bb + 1e-7
    assert b.std() > 0.2 * bb  # actually spread, not zeros

    # flax scheme still gives zero biases and tighter lecun_normal weights
    cfg_f = SSD3DConfig.create(n_classes=2, input_channels=1,
                               input_size=(32, 32, 32), init_scheme="flax")
    var_f = SSD3D(cfg_f).init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 32, 1), np.float32),
        train=False)
    assert float(np.abs(var_f["params"]["heads"]["loc_3"]["bias"]).max()) == 0.0

    # config JSON round-trip carries the scheme; old dicts default to torch
    d = cfg.to_json_dict()
    assert SSD3DConfig.from_json_dict(d).init_scheme == "torch"
    d.pop("init_scheme")
    assert SSD3DConfig.from_json_dict(d).init_scheme == "torch"


def test_create_train_state_honors_init_scheme():
    """The training entry point must deliver the configured init (round-3
    regression: the legacy kaiming override used to clobber model.init)."""
    import jax
    import numpy as np

    from mslesions3d_tpu.models import SSD3D, SSD3DConfig
    from mslesions3d_tpu.train.state import create_train_state

    def head_bias(scheme):
        cfg = SSD3DConfig.create(n_classes=2, input_channels=1,
                                 input_size=(16, 16, 16), width_mult=0.25,
                                 init_scheme=scheme)
        state = create_train_state(SSD3D(cfg), cfg, jax.random.PRNGKey(0))
        return np.asarray(state.params["heads"]["loc_3"]["bias"])

    assert np.abs(head_bias("torch")).max() > 0  # uniform band survives
    assert np.abs(head_bias("kaiming_relu")).max() == 0  # legacy zeros
    assert np.abs(head_bias("flax")).max() == 0
