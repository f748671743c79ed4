"""Model graph tests: feature map shapes, anchor-count consistency, jit
forward, decode path (SURVEY.md §4 items 1/5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfssd_tpu import get_hyper_params
from tfssd_tpu.models import get_model, init_model, make_predict_fn
from tfssd_tpu.ops.boxes import generate_anchors


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
