"""Model graph tests: feature map shapes, anchor-count consistency, jit
forward, decode path (SURVEY.md §4 items 1/5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfssd_tpu import get_hyper_params
from tfssd_tpu.models import get_model, init_model, make_predict_fn
from tfssd_tpu.ops.boxes import generate_anchors


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["mobilenet_v2", "vgg16", "vgg16_512"])
def test_forward_shapes(backbone):
    cfg = get_hyper_params(backbone)
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    imgs = jnp.zeros((2, cfg.img_size, cfg.img_size, 3))
    deltas, logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, imgs)
    assert deltas.shape == (2, cfg.total_anchors, 4)
    assert logits.shape == (2, cfg.total_anchors, cfg.total_labels)
    assert deltas.dtype == jnp.float32 and logits.dtype == jnp.float32


def test_train_mode_updates_batch_stats():
    cfg = get_hyper_params("mobilenet_v2")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    imgs = jax.random.normal(jax.random.key(1), (2, 300, 300, 3))
    (deltas, logits), updates = model.apply(
        variables, imgs, train=True, mutable=["batch_stats"])
    # running means must move away from their zero init
    leaf = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert np.abs(np.asarray(leaf)).sum() > 0


@pytest.mark.slow
def test_predict_fn_end_to_end():
    cfg = get_hyper_params("mobilenet_v2")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    anchors = generate_anchors(cfg)
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    res = predict(variables, jnp.zeros((1, 300, 300, 3)))
    assert res.boxes.shape == (1, cfg.max_total_detections, 4)
    assert res.scores.shape == (1, cfg.max_total_detections)
    assert res.classes.shape == (1, cfg.max_total_detections)
    assert np.all(np.asarray(res.boxes) >= 0) and np.all(
        np.asarray(res.boxes) <= 1)
    # class ids are background-shifted: 0 (pad) or in [1, L)
    cls = np.asarray(res.classes)
    assert cls.min() >= 0 and cls.max() < cfg.total_labels


@pytest.mark.slow
def test_predict_data_parallel_parity():
    # BASELINE #5's serving shape: predict with the batch sharded over
    # the 8-device mesh (predictor.py's replicate+shard_batch) must
    # produce the same detections as single-device predict — the
    # decode/NMS path has no cross-image coupling, so results must be
    # bitwise-identical per image up to fp reassociation.
    from tfssd_tpu.parallel import get_mesh, replicate, shard_batch

    cfg = get_hyper_params(
        "mobilenet_v2",
        img_size=96,
        feature_map_shapes=(6, 3, 2, 1, 1, 1),
        total_labels=6,
    )
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    anchors = generate_anchors(cfg)
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    images = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (8, 96, 96, 3)),
        jnp.float32)

    single = predict(variables, images)

    mesh = get_mesh()
    assert mesh.devices.size == 8, "conftest provides the 8-device mesh"
    sharded_vars = replicate(mesh, variables)
    sharded_imgs = shard_batch(mesh, images)
    multi = predict(sharded_vars, sharded_imgs)

    np.testing.assert_allclose(np.asarray(multi.scores),
                               np.asarray(single.scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(multi.classes),
                                  np.asarray(single.classes))
    np.testing.assert_allclose(np.asarray(multi.boxes),
                               np.asarray(single.boxes), atol=1e-5)


@pytest.mark.slow
def test_bfloat16_compute_path():
    cfg = get_hyper_params("mobilenet_v2", compute_dtype="bfloat16")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    deltas, logits = model.apply(
        variables, jnp.zeros((1, 300, 300, 3)), train=False)
    # params stay fp32, outputs cast back to fp32
    p = jax.tree_util.tree_leaves(variables["params"])[0]
    assert p.dtype == jnp.float32
    assert deltas.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(logits)))


def test_fold_bn_matches_unfolded_inference():
    # Serving-mode BN folding (utils.fold_bn): the fold_bn=True model
    # with folded weights must reproduce the unfolded model's inference
    # outputs. Randomize BN stats/affines first — at init (mean=0,
    # var=1, scale=1) folding is trivially the identity and the test
    # would prove nothing.
    from tfssd_tpu.utils.fold_bn import fold_batch_norm

    small = dict(img_size=96, feature_map_shapes=(6, 3, 2, 1, 1, 1),
                 total_labels=6)
    cfg = get_hyper_params("mobilenet_v2", **small)
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))

    def randomize(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        rng = np.random.default_rng(abs(hash(tuple(names))) % (2 ** 31))
        if "bn" in names and names[-1] in ("mean", "bias"):
            return leaf + rng.normal(0, 0.3, leaf.shape).astype(leaf.dtype)
        if "bn" in names and names[-1] in ("var", "scale"):
            return leaf * rng.uniform(0.5, 2.0, leaf.shape).astype(leaf.dtype)
        return leaf

    variables = jax.tree_util.tree_map_with_path(randomize, variables)

    cfg_f = get_hyper_params("mobilenet_v2", fold_bn=True, **small)
    model_f = get_model(cfg_f)
    folded = fold_batch_norm(variables)
    # folded tree must match the fold_bn model's own init structure
    ref_tree = jax.tree_util.tree_structure(
        init_model(model_f, jax.random.key(0))["params"])
    assert jax.tree_util.tree_structure(folded["params"]) == ref_tree

    x = jax.random.normal(jax.random.key(1), (2, 96, 96, 3))
    d0, l0 = model.apply(variables, x, train=False)
    d1, l1 = model_f.apply(folded, x, train=False)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-4, atol=1e-4)

    # training under fold_bn is an error, not a silent wrong result
    with pytest.raises(ValueError, match="inference-only"):
        model_f.apply(folded, x, train=True, mutable=["batch_stats"])


@pytest.mark.slow
def test_remat_matches_no_remat():
    # remat must change memory behavior only: same outputs, same grads,
    # same param tree names (checkpoint compatibility).
    cfg0 = get_hyper_params(
        "mobilenet_v2", img_size=96, feature_map_shapes=(6, 3, 2, 1, 1, 1),
        total_labels=6)
    cfg1 = get_hyper_params(
        "mobilenet_v2", img_size=96, feature_map_shapes=(6, 3, 2, 1, 1, 1),
        total_labels=6, remat=True)
    m0, m1 = get_model(cfg0), get_model(cfg1)
    v0 = init_model(m0, jax.random.key(0))
    v1 = init_model(m1, jax.random.key(0))
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

    x = jax.random.normal(jax.random.key(1), (2, 96, 96, 3))

    def loss(m, v):
        d, l = m.apply(v, x, train=False)
        return jnp.sum(d ** 2) + jnp.sum(jax.nn.log_softmax(l) ** 2)

    l0, g0 = jax.value_and_grad(lambda v: loss(m0, v))(v0)
    l1, g1 = jax.value_and_grad(lambda v: loss(m1, v))(v1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_export_predict_roundtrip():
    # predictor.py --export: the serialized StableHLO artifact must
    # reproduce the live jitted predict bit-for-bit (same weights baked
    # in, same platform) after a serialize/deserialize round trip.
    from tfssd_tpu.utils.export import export_predict, load_exported

    cfg = get_hyper_params(
        "mobilenet_v2", img_size=96,
        feature_map_shapes=(6, 3, 2, 1, 1, 1), total_labels=6,
        max_gt_boxes=8)
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    anchors = generate_anchors(cfg)
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    imgs = jax.random.uniform(jax.random.key(3), (2, 96, 96, 3),
                              minval=-1, maxval=1)

    blob = export_predict(model, anchors, cfg, jax.device_get(variables),
                          batch_size=2, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000
    serve = load_exported(blob)
    got = serve(imgs)
    want = predict(variables, imgs)
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(want.classes))
    # boxes: with random weights every candidate scores ~1/num_classes,
    # and ULP-level score differences between the two compilations of
    # the same program can swap the rank of near-ties — allow a couple
    # of swapped rows, require the rest to match tightly.
    diff = np.abs(np.asarray(got.boxes) - np.asarray(want.boxes))
    rows_off = (diff.max(axis=-1) > 1e-4).sum()
    assert rows_off <= 0.02 * diff.shape[0] * diff.shape[1], rows_off
