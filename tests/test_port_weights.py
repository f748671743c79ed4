"""Keras -> Flax weight porting + graph parity vs TF (SURVEY.md §4 item 7:
fixed weights -> outputs match within fp tolerance).

Builds randomly-initialized keras.applications trunks, ports the weights,
and asserts the Flax backbones reproduce the Keras feature maps at the
SSD tap points. This is the layer-for-layer proof that our trunks ARE
the reference's trunks.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tfssd_tpu.models.mobilenet_v2 import MobileNetV2Backbone  # noqa: E402
from tfssd_tpu.models.vgg16 import VGG16Backbone  # noqa: E402
from tfssd_tpu.utils.port_weights import (  # noqa: E402
    graft,
    keras_model_weights,
    port_mobilenet_v2,
    port_vgg16,
)


@pytest.fixture(scope="module", autouse=True)
def _tf_cpu():
    tf.config.set_visible_devices([], "GPU")
    yield


@pytest.mark.slow
def test_mobilenet_v2_trunk_parity():
    keras_model = tf.keras.applications.MobileNetV2(
        input_shape=(300, 300, 3), include_top=False, weights=None)
    weights = keras_model_weights(keras_model)
    tree = port_mobilenet_v2(weights)

    backbone = MobileNetV2Backbone()
    x = np.random.default_rng(0).uniform(-1, 1, (1, 300, 300, 3)).astype(
        np.float32)
    variables = backbone.init(jax.random.key(0), jnp.asarray(x), train=False)
    variables = graft({"params": {"backbone": variables["params"]},
                       "batch_stats": {"backbone": variables["batch_stats"]}},
                      tree)
    flax_vars = {"params": variables["params"]["backbone"],
                 "batch_stats": variables["batch_stats"]["backbone"]}
    taps = backbone.apply(flax_vars, jnp.asarray(x), train=False)

    # Keras reference taps.
    tap1 = tf.keras.Model(keras_model.input, keras_model.get_layer(
        "block_13_expand_relu").output)(x).numpy()
    tap2 = keras_model(x).numpy()  # out_relu 10x10x1280

    got1 = np.asarray(taps[0])
    got2 = np.asarray(taps[1])
    assert got1.shape == tap1.shape, (got1.shape, tap1.shape)
    assert got2.shape == tap2.shape, (got2.shape, tap2.shape)
    np.testing.assert_allclose(got1, tap1, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got2, tap2, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_port_h5_then_train_step():
    """trainer.py --port-h5 path: graft a random Keras MBv2 trunk from an
    h5 file into a fresh train state and run ONE train step — no shape
    errors, finite loss (reference parity: fine-tuning from
    keras.applications ImageNet trunks, SURVEY.md §7 hard parts)."""
    import os
    import tempfile

    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.data import SyntheticDataset, batch_examples
    from tfssd_tpu.models import get_model
    from tfssd_tpu.ops.boxes import generate_anchors
    from tfssd_tpu.train import (
        create_train_state, make_optimizer, make_train_step)
    from tfssd_tpu.utils.port_weights import port_h5_into_variables

    keras_model = tf.keras.applications.MobileNetV2(
        input_shape=(96, 96, 3), include_top=False, weights=None)
    with tempfile.TemporaryDirectory() as tmp:
        h5 = os.path.join(tmp, "trunk.h5")
        keras_model.save(h5)

        # Conv trunk weights are image-size independent: a small-image
        # config keeps this test's compile cheap while grafting the SAME
        # trunk tensors the 300x300 model uses.
        cfg = get_hyper_params(
            "mobilenet_v2", img_size=64,
            feature_map_shapes=(4, 2, 1, 1, 1, 1),
            total_labels=6, max_gt_boxes=4)
        model = get_model(cfg)
        opt = make_optimizer(1e-3)
        state = create_train_state(model, jax.random.key(0), opt)
        ported = port_h5_into_variables(
            {"params": state.params, "batch_stats": state.batch_stats},
            cfg.backbone, h5)

    # the trunk actually changed (not a no-op graft)
    old = state.params["backbone"]["stem"]["conv"]["kernel"]
    new = ported["params"]["backbone"]["stem"]["conv"]["kernel"]
    assert not np.allclose(np.asarray(old), np.asarray(new))

    state = state.replace(params=ported["params"],
                          batch_stats=ported["batch_stats"])
    anchors = generate_anchors(cfg)
    step = make_train_step(model, anchors, opt, augment=False)
    ds = SyntheticDataset(8, image_size=cfg.img_size, num_classes=5)
    batch = next(batch_examples(ds, 4, cfg.max_gt_boxes))
    new_state, metrics = jax.jit(step)(
        state,
        {"image": jnp.asarray(batch["image"]),
         "boxes": jnp.asarray(batch["boxes"]),
         "labels": jnp.asarray(batch["labels"])},
        jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_vgg16_trunk_parity():
    keras_model = tf.keras.applications.VGG16(
        input_shape=(300, 300, 3), include_top=False, weights=None)
    weights = keras_model_weights(keras_model)
    tree = port_vgg16(weights)

    backbone = VGG16Backbone()
    x = np.random.default_rng(1).uniform(-1, 1, (1, 300, 300, 3)).astype(
        np.float32)
    variables = backbone.init(jax.random.key(0), jnp.asarray(x), train=False)
    params = dict(variables["params"])
    for k, v in tree["params"].items():
        params[k] = jax.tree_util.tree_map(jnp.asarray, v)

    # Stock Keras VGG16 floor-pools 75 -> 37 at pool3; SSD300's canonical
    # spec (and the reference's 38x38 conv4_3 / 8732-anchor layout) needs
    # ceil-mode 75 -> 38, which our backbone implements. Parity is
    # therefore asserted at block3_conv3 (75x75, the last point both
    # graphs agree structurally) — it covers all 7 ported conv layers up
    # to there plus 2 pools; the remaining ported layers use the identical
    # mapping code path.
    keras_c33 = tf.keras.Model(
        keras_model.input,
        keras_model.get_layer("block3_conv3").output)(x).numpy()

    import flax.linen as fnn
    from tfssd_tpu.models.vgg16 import _conv_group, _pool

    class Trunk3(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = _conv_group(x, 64, 2, "conv1", jnp.float32)
            x = _pool(x)
            x = _conv_group(x, 128, 2, "conv2", jnp.float32)
            x = _pool(x)
            return _conv_group(x, 256, 3, "conv3", jnp.float32)

    t3 = Trunk3()
    v3 = t3.init(jax.random.key(0), jnp.asarray(x))
    p3 = {k: params[k] for k in v3["params"]}
    got = np.asarray(t3.apply({"params": p3}, jnp.asarray(x)))
    assert got.shape == keras_c33.shape
    np.testing.assert_allclose(got, keras_c33, atol=2e-4, rtol=1e-3)

    # Full backbone still produces the SSD300-canonical 38x38 first map.
    taps = backbone.apply({"params": params}, jnp.asarray(x), train=False)
    assert taps[0].shape == (1, 38, 38, 512)


@pytest.mark.slow
def test_vgg16_trunk_parity_full_depth():
    """Full 13-conv-layer VGG16 port proof (VERDICT r2 missing #4).

    The 300x300 test above stops at block3 because stock Keras
    floor-pools 75 -> 37 at pool3 while SSD's canonical grid needs
    ceil-mode 75 -> 38. At input 320 every pool input is even
    (320/160/80/40/20), so floor == ceil and the two graphs are
    structurally identical THROUGH conv5_3 — proving the ported
    conv4_x/conv5_x weights (and the shared mapping code path) with the
    same <=2e-4 tolerance as the MBv2 test. This makes `--port-h5`
    trustworthy for reference VGG16 weights end to end: fc6/fc7/extras
    have no Keras counterpart (SSD additions), so conv5_3 is the last
    portable tensor.
    """
    keras_model = tf.keras.applications.VGG16(
        input_shape=(320, 320, 3), include_top=False, weights=None)
    weights = keras_model_weights(keras_model)
    tree = port_vgg16(weights)

    x = np.random.default_rng(2).uniform(-1, 1, (1, 320, 320, 3)).astype(
        np.float32)

    import flax.linen as fnn
    from tfssd_tpu.models.vgg16 import _conv_group, _pool

    class Trunk5(fnn.Module):
        """conv1_1 .. conv5_3 exactly as VGG16Backbone orders them."""

        @fnn.compact
        def __call__(self, x):
            x = _conv_group(x, 64, 2, "conv1", jnp.float32)
            x = _pool(x)
            x = _conv_group(x, 128, 2, "conv2", jnp.float32)
            x = _pool(x)
            x = _conv_group(x, 256, 3, "conv3", jnp.float32)
            x = _pool(x)
            x = _conv_group(x, 512, 3, "conv4", jnp.float32)
            x = _pool(x)
            return _conv_group(x, 512, 3, "conv5", jnp.float32)

    t5 = Trunk5()
    v5 = t5.init(jax.random.key(0), jnp.asarray(x))
    ported = {k: jax.tree_util.tree_map(jnp.asarray, v)
              for k, v in tree["params"].items()}
    assert set(v5["params"]) == set(ported), (
        sorted(v5["params"]), sorted(ported))
    got = np.asarray(t5.apply({"params": ported}, jnp.asarray(x)))

    keras_c53 = tf.keras.Model(
        keras_model.input,
        keras_model.get_layer("block5_conv3").output)(x).numpy()
    assert got.shape == keras_c53.shape, (got.shape, keras_c53.shape)
    np.testing.assert_allclose(got, keras_c53, atol=2e-4, rtol=1e-3)
