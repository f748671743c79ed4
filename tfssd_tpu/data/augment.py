"""SSD data augmentation — batched, shape-static, fully in-jit.

Reference parity: utils/augmentation.py:apply — random photometric ops
(brightness/contrast/saturation/hue), zoom-out expand into a mean-filled
canvas, SSD random-patch crop with a min-IoU constraint sampled from
{none, 0.1, 0.3, 0.5, 0.7, 0.9}, horizontal flip, and box
remap/clip/center-filtering (SURVEY.md §2 #12).

TPU-first redesign (SURVEY.md §7 "hard parts"): the reference's crop is a
data-dependent Python retry loop with dynamic output shapes — impossible
under jit. Here the whole geometric pipeline (expand ∘ crop) is expressed
as ONE affine resample per image via `jax.image.scale_and_translate`
with static output shape:

  * expand is a crop with a region larger than the unit square,
  * crop candidates (NUM_TRIALS of them) are sampled and *scored* in-graph
    (min-IoU constraint + at-least-one-gt-center), and the first valid
    candidate is selected with a masked argmax — candidates are iid, so
    "first passing of NUM_TRIALS pre-sampled" equals the reference's
    sequential retry loop in distribution (same trial budget, same
    per-trial proposal law, same accept test); verified statistically
    against a sequential numpy oracle in
    tests/test_augment_distribution.py — zero dynamic shapes,
  * the two regions compose into a single (scale, translate) pair, so the
    image is resampled exactly once,
  * out-of-bounds fill uses the per-image channel mean (the reference's
    expand fill).

Everything vmaps over the batch and runs on-device inside the train step,
so augmentation rides the VPU instead of host CPU (the reference runs it
in tf.data host threads).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Crop candidates scored per image. 50 matches the reference retry loop's
# trial budget (SSD's canonical max_trials=50): "first valid of NUM_TRIALS
# pre-sampled iid candidates" is the SAME distribution as "sequential
# retry up to NUM_TRIALS trials" — candidates are iid, so conditioning on
# the first passing index is identical either way — and with the trial
# budgets equal the fallback (no-crop) probability matches too. The
# earlier 24 made fallback measurably likelier under hard constraints
# (e.g. accept-rate 5%/trial: P(fallback) 0.29 vs 0.077 at 50); see
# tests/test_augment_distribution.py for the measured parity. Cost: the
# b64 MBv2 train step measured 36.9 vs 36.0 ms (24 trials) in a same-
# session interleaved A/B — augment_batch ALONE times identically (5.09
# vs 5.10 ms), so the delta is XLA schedule variance of the full-step
# compile, not candidate math; accepted for distributional correctness.
NUM_TRIALS = 50
_MIN_IOU_CHOICES = jnp.asarray([-1.0, 0.1, 0.3, 0.5, 0.7, 0.9])


# ---------------------------------------------------------------------------
# Photometric ops (reference: random_brightness/contrast/hue/saturation).
# Images are float32 in [0, 1].
# ---------------------------------------------------------------------------


def _rgb_to_gray(img: Array) -> Array:
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def adjust_brightness(img: Array, delta: Array) -> Array:
    return img + delta


def adjust_contrast(img: Array, factor: Array) -> Array:
    # Per-CHANNEL mean pivot, as tf.image.adjust_contrast (the reference
    # op) does — a global-mean pivot would shift channel balance (color
    # cast) whenever channel means differ.
    mean = jnp.mean(img, axis=(-3, -2), keepdims=True)
    return (img - mean) * factor + mean


def adjust_saturation(img: Array, factor: Array) -> Array:
    gray = _rgb_to_gray(img)
    return gray + (img - gray) * factor


def adjust_hue(img: Array, delta: Array) -> Array:
    """Hue rotation by `delta` (in turns, [-0.5, 0.5]) via YIQ rotation —
    the standard linear approximation of HSV hue shift."""
    t = delta * 2.0 * jnp.pi
    cos, sin = jnp.cos(t), jnp.sin(t)
    # RGB -> YIQ
    m = jnp.asarray([[0.299, 0.587, 0.114],
                     [0.596, -0.274, -0.322],
                     [0.211, -0.523, 0.312]], img.dtype)
    m_inv = jnp.linalg.inv(m)
    yiq = img @ m.T
    rot = jnp.stack([
        yiq[..., 0],
        yiq[..., 1] * cos - yiq[..., 2] * sin,
        yiq[..., 1] * sin + yiq[..., 2] * cos,
    ], axis=-1)
    return rot @ m_inv.T


def photometric(rng: Array, img: Array) -> Array:
    """Randomly-applied photometric distortions, each with prob 0.5
    (reference augmentation.randomly_apply_operation over the four ops)."""
    keys = jax.random.split(rng, 8)
    apply = jax.random.uniform(keys[0], (4,)) < 0.5
    img = jnp.where(
        apply[0],
        adjust_brightness(img, jax.random.uniform(keys[1], (), minval=-0.2,
                                                  maxval=0.2)),
        img)
    img = jnp.where(
        apply[1],
        adjust_contrast(img, jax.random.uniform(keys[2], (), minval=0.5,
                                                maxval=1.5)),
        img)
    img = jnp.where(
        apply[2],
        adjust_saturation(img, jax.random.uniform(keys[3], (), minval=0.5,
                                                  maxval=1.5)),
        img)
    img = jnp.where(
        apply[3],
        adjust_hue(img, jax.random.uniform(keys[4], (), minval=-0.08,
                                           maxval=0.08)),
        img)
    return jnp.clip(img, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Geometric: expand ∘ SSD random-patch crop as one affine region.
# A "region" is (y0, x0, h, w) in normalized input coords; the output image
# is that region resampled to the full static canvas.
# ---------------------------------------------------------------------------


def _sample_expand(rng: Array) -> Array:
    """Zoom-out region (reference augmentation.expand): ratio in [1, 4],
    image placed uniformly in the canvas. Returns region (4,)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    ratio = jax.random.uniform(k1, (), minval=1.0, maxval=4.0)
    py = jax.random.uniform(k2, (), minval=0.0, maxval=1.0) * (ratio - 1.0)
    px = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (ratio - 1.0)
    return jnp.stack([-py, -px, ratio, ratio])


def _region_iou(region: Array, boxes: Array) -> Array:
    """IoU of the crop rectangle with each gt box. region (4,)=(y0,x0,h,w),
    boxes (G, 4) corners -> (G,)."""
    ry0, rx0, rh, rw = region[0], region[1], region[2], region[3]
    ry1, rx1 = ry0 + rh, rx0 + rw
    iy0 = jnp.maximum(ry0, boxes[:, 0])
    ix0 = jnp.maximum(rx0, boxes[:, 1])
    iy1 = jnp.minimum(ry1, boxes[:, 2])
    ix1 = jnp.minimum(rx1, boxes[:, 3])
    inter = jnp.maximum(iy1 - iy0, 0) * jnp.maximum(ix1 - ix0, 0)
    area_b = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    union = rh * rw + area_b - inter
    return inter / jnp.maximum(union, 1e-8)


def _sample_crop_with_stats(rng: Array, boxes: Array, valid: Array):
    """SSD random-patch crop in-graph (reference random_patch w/ retries).

    Scores NUM_TRIALS candidates; picks the first satisfying the sampled
    min-IoU constraint AND containing at least one gt center. Falls back
    to the identity region. boxes (G, 4), valid (G,) bool. Returns
    (region (4,), stats) where stats carries the sampled constraint and
    the outcome — consumed by the distribution-parity test
    (tests/test_augment_distribution.py), dead-code-eliminated by XLA in
    the train step (which only uses the region).
    """
    k_iou, k_wh, k_pos, k_none = jax.random.split(rng, 4)
    iou_choice = jax.random.randint(k_iou, (), 0, len(_MIN_IOU_CHOICES))
    min_iou = _MIN_IOU_CHOICES[iou_choice]
    # "none" choice: skip cropping entirely with prob 1/7 (reference treats
    # no-crop as one of the sampler outcomes).
    skip = jax.random.uniform(k_none, ()) < (1.0 / 7.0)

    wh = jax.random.uniform(k_wh, (NUM_TRIALS, 2), minval=0.3, maxval=1.0)
    h, w = wh[:, 0], wh[:, 1]
    ar_ok = (w / h > 0.5) & (w / h < 2.0)
    pos = jax.random.uniform(k_pos, (NUM_TRIALS, 2))
    y0 = pos[:, 0] * (1.0 - h)
    x0 = pos[:, 1] * (1.0 - w)
    regions = jnp.stack([y0, x0, h, w], axis=-1)          # (T, 4)

    ious = jax.vmap(lambda r: _region_iou(r, boxes))(regions)  # (T, G)
    ious = jnp.where(valid[None, :], ious, -1.0)
    iou_ok = jnp.max(ious, axis=-1) >= min_iou

    cy = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cx = (boxes[:, 1] + boxes[:, 3]) / 2.0
    center_in = (
        (cy[None, :] > y0[:, None]) & (cy[None, :] < (y0 + h)[:, None])
        & (cx[None, :] > x0[:, None]) & (cx[None, :] < (x0 + w)[:, None])
        & valid[None, :]
    )
    has_center = jnp.any(center_in, axis=-1)

    ok = ar_ok & iou_ok & has_center                      # (T,)
    first = jnp.argmax(ok)                                # first True, else 0
    any_ok = jnp.any(ok)
    identity = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    accepted = ~skip & any_ok
    region = jnp.where(accepted, regions[first], identity)
    stats = {"iou_choice": iou_choice, "skip": skip, "accepted": accepted}
    return region, stats


def _sample_crop(rng: Array, boxes: Array, valid: Array) -> Array:
    return _sample_crop_with_stats(rng, boxes, valid)[0]


def _compose(outer: Array, inner: Array) -> Array:
    """Region composition: apply `outer` (expand) to the input, then `inner`
    (crop) to the result; returns the equivalent single input region."""
    oy, ox, oh, ow = outer[0], outer[1], outer[2], outer[3]
    iy, ix, ih, iw = inner[0], inner[1], inner[2], inner[3]
    return jnp.stack([oy + iy * oh, ox + ix * ow, ih * oh, iw * ow])


def _transform_boxes(boxes: Array, region: Array) -> Array:
    y0, x0, h, w = region[0], region[1], region[2], region[3]
    shift = jnp.stack([y0, x0, y0, x0])
    scale = jnp.stack([h, w, h, w])
    return (boxes - shift) / scale


def _apply_region(img: Array, region: Array) -> Array:
    """Resample `region` of the image to the full canvas with per-image
    channel-mean fill (one scale_and_translate + oob mask).

    Measured choice (tools/augment_ab.py, v5e, batch 64): the dense
    per-image sampling matrices scale_and_translate builds ride the MXU
    at 4.97 ms/batch; a 2-tap separable bilinear-gather rewrite (TF's
    antialias=False semantics, O(S²) work instead of O(S³)) measured
    8.98 ms standalone and 36.8 vs 34.3 ms in the full train step — TPU
    gathers lose to "wasteful" matmuls here. Kept: scale_and_translate.
    """
    size = img.shape[0]
    y0, x0, h, w = region[0], region[1], region[2], region[3]
    # output coord o (pixels) samples input at o*h + y0 (normalized):
    # scale_and_translate: in = (out - t) / s  =>  s = 1/h, t = -y0*size/h.
    scale = jnp.stack([1.0 / h, 1.0 / w])
    trans = jnp.stack([-y0 * size / h, -x0 * size / w])
    out = jax.image.scale_and_translate(
        img, img.shape, (0, 1), scale, trans, method="linear")
    # Mean fill for out-of-bounds samples (expand's canvas fill).
    coords = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    in_y = (coords * h + y0 >= 0.0) & (coords * h + y0 <= 1.0)
    in_x = (coords * w + x0 >= 0.0) & (coords * w + x0 <= 1.0)
    inside = in_y[:, None, None] & in_x[None, :, None]
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    return jnp.where(inside, out, mean)


def augment_image(
    rng: Array,
    img: Array,       # (S, S, 3) float32 in [0, 1]
    boxes: Array,     # (G, 4) normalized corners, zero-padded
    labels: Array,    # (G,) int32; 0 on padding
) -> Tuple[Array, Array, Array]:
    """Full reference augmentation chain for one image."""
    k_photo, k_exp_p, k_exp, k_crop, k_flip = jax.random.split(rng, 5)
    img = photometric(k_photo, img)

    valid = labels > 0
    identity = jnp.asarray([0.0, 0.0, 1.0, 1.0])

    # Expand with prob 0.5 (reference randomly_apply_operation(expand)).
    do_expand = jax.random.uniform(k_exp_p, ()) < 0.5
    expand_region = jnp.where(do_expand, _sample_expand(k_exp), identity)

    # Crop sampled in post-expand coordinates.
    boxes_e = _transform_boxes(boxes, expand_region)
    crop_region = _sample_crop(k_crop, boxes_e, valid)
    region = _compose(expand_region, crop_region)

    img = _apply_region(img, region)
    boxes = _transform_boxes(boxes, region)

    # Filter: keep boxes whose center stays inside the patch (reference
    # box-center filtering), then clip to the canvas.
    cy = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cx = (boxes[:, 1] + boxes[:, 3]) / 2.0
    keep = valid & (cy > 0) & (cy < 1) & (cx > 0) & (cx < 1)
    boxes = jnp.clip(boxes, 0.0, 1.0)

    # Horizontal flip with prob 0.5 (reference flip_horizontally).
    do_flip = jax.random.uniform(k_flip, ()) < 0.5
    flipped = jnp.stack(
        [boxes[:, 0], 1.0 - boxes[:, 3], boxes[:, 2], 1.0 - boxes[:, 1]],
        axis=-1)
    img = jnp.where(do_flip, img[:, ::-1, :], img)
    boxes = jnp.where(do_flip, flipped, boxes)

    boxes = jnp.where(keep[:, None], boxes, 0.0)
    labels = jnp.where(keep, labels, 0)
    return img, boxes, labels


def augment_batch(rng: Array, images: Array, boxes: Array, labels: Array
                  ) -> Tuple[Array, Array, Array]:
    """Batched augmentation (vmapped augment_image) — lives inside the
    jitted train step, sharded with the batch."""
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(augment_image)(rngs, images, boxes, labels)
