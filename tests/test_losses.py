"""Loss tests (SURVEY.md §4 item 3): hard-negative counts, zero-positive
safety, masked Huber vs a numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from tfssd_tpu.ops import losses


def test_huber_matches_numpy():
    x = np.linspace(-3, 3, 101).astype(np.float32)
    got = np.asarray(losses.huber(jnp.asarray(x)))
    want = np.where(np.abs(x) <= 1.0, 0.5 * x * x, np.abs(x) - 0.5)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_localization_loss_oracle():
    rng = np.random.RandomState(0)
    actual = rng.randn(2, 16, 4).astype(np.float32)
    pred = rng.randn(2, 16, 4).astype(np.float32)
    pos = rng.rand(2, 16) > 0.5
    got = float(losses.localization_loss(
        jnp.asarray(actual), jnp.asarray(pred), jnp.asarray(pos)))
    r = pred - actual
    hub = np.where(np.abs(r) <= 1, 0.5 * r * r, np.abs(r) - 0.5).sum(-1)
    per_img = (hub * pos).sum(-1) / np.maximum(pos.sum(-1), 1)
    np.testing.assert_allclose(got, per_img.mean(), rtol=1e-5)


def test_loc_loss_ignores_negatives():
    actual = jnp.zeros((1, 8, 4))
    pred = jnp.ones((1, 8, 4)) * 100.0
    no_pos = jnp.zeros((1, 8), bool)
    assert float(losses.localization_loss(actual, pred, no_pos)) == 0.0


def test_rank_descending():
    v = jnp.asarray([[0.1, 0.9, 0.5, 0.7]])
    r = np.asarray(losses.rank_descending(v))
    np.testing.assert_array_equal(r[0], [3, 0, 2, 1])


def test_hard_negative_count_is_3x_pos():
    """Construct a case with known positives and check exactly
    neg_pos_ratio * #pos negatives contribute."""
    n, l = 32, 5
    rng = np.random.RandomState(1)
    labels = np.zeros((1, n, l), np.float32)
    labels[:, :, 0] = 1.0
    # 2 positives
    labels[0, 0] = [0, 1, 0, 0, 0]
    labels[0, 1] = [0, 0, 1, 0, 0]
    logits = rng.randn(1, n, l).astype(np.float32)
    got = float(losses.confidence_loss(jnp.asarray(labels),
                                       jnp.asarray(logits), neg_pos_ratio=3))
    # numpy oracle
    x = logits - logits.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    ce = -(labels * logp).sum(-1)[0]
    pos_ce = ce[:2].sum()
    neg_sorted = np.sort(ce[2:])[::-1]
    want = (pos_ce + neg_sorted[:6].sum()) / 2.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_zero_positive_image_no_nan():
    n, l = 16, 5
    labels = np.zeros((2, n, l), np.float32)
    labels[:, :, 0] = 1.0  # all background
    logits = np.random.RandomState(2).randn(2, n, l).astype(np.float32)
    loss = float(losses.confidence_loss(jnp.asarray(labels),
                                        jnp.asarray(logits)))
    assert np.isfinite(loss)
    # 3 * 0 positives -> no negatives selected either -> loss 0
    assert loss == 0.0


def test_ssd_losses_gradients_finite():
    n, l = 64, 21
    rng = np.random.RandomState(3)
    actual_deltas = jnp.asarray(rng.randn(2, n, 4), jnp.float32)
    labels = np.zeros((2, n, l), np.float32)
    labels[:, :, 0] = 1.0
    labels[0, 3] = np.eye(l)[4]
    actual_labels = jnp.asarray(labels)

    def f(params):
        total, _ = losses.ssd_losses(
            actual_deltas, actual_labels, params["d"], params["l"])
        return total

    params = {
        "d": jnp.asarray(rng.randn(2, n, 4), jnp.float32),
        "l": jnp.asarray(rng.randn(2, n, l), jnp.float32),
    }
    grads = jax.grad(f)(params)
    assert np.all(np.isfinite(np.asarray(grads["d"])))
    assert np.all(np.isfinite(np.asarray(grads["l"])))
