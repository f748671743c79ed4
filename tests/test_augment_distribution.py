"""Distributional parity of the in-jit crop sampler vs a sequential-retry
oracle (SURVEY.md §7 hard part #2, VERDICT r4 next #2).

The reference (utils/augmentation.py:apply, random-patch retry loop per
SURVEY §2 #12) samples a min-IoU constraint from {none, 0.1, 0.3, 0.5,
0.7, 0.9}, then sequentially draws candidate patches (w, h ~ U[0.3, 1],
aspect limited to (0.5, 2), position uniform) until one passes the
constraint + contains a gt center, giving up after a bounded trial budget
(SSD's canonical max_trials = 50). `_sample_crop` pre-samples NUM_TRIALS
iid candidates and takes the first passing one — the SAME stochastic
process when the budgets agree, since conditioning iid draws on the first
success is order-identical. These tests check that claim EMPIRICALLY
against an independently-written numpy oracle: acceptance rate per
constraint, fallback frequency, and the accepted-patch geometry
distribution (area / aspect / position) must agree within sampling error.

All comparisons run with fixed seeds, so the tests are deterministic;
tolerances are sized at >= 4 sigma of the two-sample difference so a
re-seed would virtually never flip them (verified against oracle-vs-
oracle noise with disjoint seeds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfssd_tpu.data import augment


# ---------------------------------------------------------------------------
# The oracle: reference semantics, sequential, plain numpy.
# ---------------------------------------------------------------------------

_ORACLE_CHOICES = [None, -1.0, 0.1, 0.3, 0.5, 0.7, 0.9]  # None = skip crop


def oracle_sample_crop(rng: np.random.Generator, boxes: np.ndarray,
                       valid: np.ndarray, trials: int):
    """Sequential-retry crop sampler: the reference's loop in numpy.

    Returns (region (4,) as (y0, x0, h, w), info dict). Draws one
    constraint; then up to `trials` sequential candidates, returning the
    FIRST that passes aspect + min-IoU + has-a-center; identity region on
    exhaustion or the 'none' constraint.
    """
    choice = rng.integers(0, len(_ORACLE_CHOICES))
    min_iou = _ORACLE_CHOICES[choice]
    info = {"choice": choice, "accepted": False, "n_trials": 0}
    identity = np.array([0.0, 0.0, 1.0, 1.0])
    if min_iou is None:
        return identity, info
    vb = boxes[valid]
    cy = (vb[:, 0] + vb[:, 2]) / 2.0
    cx = (vb[:, 1] + vb[:, 3]) / 2.0
    area_b = np.maximum(vb[:, 2] - vb[:, 0], 0) * np.maximum(
        vb[:, 3] - vb[:, 1], 0)
    for t in range(trials):
        info["n_trials"] = t + 1
        h = rng.uniform(0.3, 1.0)
        w = rng.uniform(0.3, 1.0)
        if not (0.5 < w / h < 2.0):
            continue
        y0 = rng.uniform(0.0, 1.0) * (1.0 - h)
        x0 = rng.uniform(0.0, 1.0) * (1.0 - w)
        iy0 = np.maximum(y0, vb[:, 0])
        ix0 = np.maximum(x0, vb[:, 1])
        iy1 = np.minimum(y0 + h, vb[:, 2])
        ix1 = np.minimum(x0 + w, vb[:, 3])
        inter = np.maximum(iy1 - iy0, 0) * np.maximum(ix1 - ix0, 0)
        iou = inter / np.maximum(h * w + area_b - inter, 1e-8)
        if vb.shape[0] and np.max(iou) < min_iou:
            continue
        center_in = ((cy > y0) & (cy < y0 + h)
                     & (cx > x0) & (cx < x0 + w))
        if not np.any(center_in):
            continue
        info["accepted"] = True
        return np.array([y0, x0, h, w]), info
    return identity, info


def _run_oracle(boxes, valid, n, trials, seed):
    rng = np.random.default_rng(seed)
    regions, choices, accepted = [], [], []
    for _ in range(n):
        r, info = oracle_sample_crop(rng, boxes, valid, trials)
        regions.append(r)
        choices.append(info["choice"])
        accepted.append(info["accepted"])
    return (np.stack(regions), np.asarray(choices),
            np.asarray(accepted, bool))


def _run_jax(boxes, valid, n, seed):
    keys = jax.random.split(jax.random.key(seed), n)
    bx = jnp.asarray(boxes, jnp.float32)
    vl = jnp.asarray(valid)
    regions, stats = jax.jit(jax.vmap(
        lambda k: augment._sample_crop_with_stats(k, bx, vl)))(keys)
    return (np.asarray(regions), np.asarray(stats["iou_choice"]),
            np.asarray(stats["accepted"], bool))


# Scenes spanning the accept-rate range: an easy centered box, a hard
# small off-center box (low accept rate under 0.9 -> fallback matters),
# and a multi-box scene.
_SCENES = {
    "easy": np.array([[0.3, 0.3, 0.8, 0.8]], np.float32),
    "hard_small": np.array([[0.05, 0.05, 0.18, 0.2]], np.float32),
    "multi": np.array([[0.1, 0.1, 0.4, 0.35], [0.5, 0.55, 0.9, 0.95],
                       [0.4, 0.2, 0.6, 0.5]], np.float32),
}
# sized so even the lowest-acceptance scene (hard_small, ~16% accepted)
# yields ~2k accepted samples per side — the quartile-CDF checks' sigma
# is then ~0.011, comfortably inside the 0.05 tolerance.
_N = 12000


def _masks(choices, accepted, regions):
    is_identity = np.all(
        np.abs(regions - np.array([0.0, 0.0, 1.0, 1.0])) < 1e-7, axis=-1)
    return is_identity


@pytest.mark.parametrize("scene", sorted(_SCENES))
def test_crop_sampler_matches_sequential_oracle(scene):
    boxes = _SCENES[scene]
    valid = np.ones(len(boxes), bool)
    jr, jc, ja = _run_jax(boxes, valid, _N, seed=0)
    orr, oc, oa = _run_oracle(boxes, valid, _N, augment.NUM_TRIALS, seed=1)

    # wholesale outcome frequencies: P(identity) and P(accepted). Binomial
    # two-sample sigma at N=12000 is <= 0.0065; tolerance 0.04 > 6 sigma.
    np.testing.assert_allclose(ja.mean(), oa.mean(), atol=0.04)
    ji, oi = _masks(jc, ja, jr), _masks(oc, oa, orr)
    np.testing.assert_allclose(ji.mean(), oi.mean(), atol=0.04)

    # The two sides FACTOR the constraint draw differently — the oracle
    # picks one uniform choice over 7 outcomes {none, -1, .1, .3, .5,
    # .7, .9}; the jax sampler picks a threshold uniformly over 6 AND an
    # independent skip with P = 1/7, so P(none) = 1/7 and P(accepted
    # with threshold k) = (1/6)(6/7)P(pass|k) = (1/7)P(pass|k) on both
    # sides. The quantity the factoring must preserve is the JOINT
    # frequency P(accepted, constraint = k) — conditionals on the
    # constraint differ by the (6/7) skip factor by design.
    for thr_idx in range(6):          # jax iou_choice 0..5 = [-1.0 .. 0.9]
        jf = (ja & (jc == thr_idx)).mean()
        of = (oa & (oc == thr_idx + 1)).mean()   # oracle choice 0 = none
        # joint frequencies <= 1/7; two-sample sigma <= 0.005 at N=12000
        np.testing.assert_allclose(
            jf, of, atol=0.025,
            err_msg=f"P(accepted, min-IoU choice {thr_idx})")

    # accepted-patch geometry: area, aspect, and position distributions.
    jacc, oacc = jr[ja], orr[oa]
    for name, f in (("area", lambda r: r[:, 2] * r[:, 3]),
                    ("aspect", lambda r: r[:, 3] / r[:, 2]),
                    ("y0", lambda r: r[:, 0]),
                    ("x0", lambda r: r[:, 1])):
        a, b = f(jacc), f(oacc)
        np.testing.assert_allclose(a.mean(), b.mean(), atol=0.035,
                                   err_msg=f"{name} mean")
        np.testing.assert_allclose(a.std(), b.std(), atol=0.035,
                                   err_msg=f"{name} std")
        # coarse CDF agreement at the accepted-sample quartiles
        qs = np.quantile(b, [0.25, 0.5, 0.75])
        for q, qv in zip((0.25, 0.5, 0.75), qs):
            np.testing.assert_allclose(
                (a <= qv).mean(), q, atol=0.05,
                err_msg=f"{name} CDF at oracle q{q}")


def test_trial_budget_parity_is_material():
    """The r4 sampler used NUM_TRIALS=24; show 24-vs-50 is a REAL
    distributional divergence (so matching the reference's trial budget
    is load-bearing, not cosmetic), and that the jitted sampler tracks
    the 50-trial oracle. Scene chosen so mid-range per-trial accept
    rates leave the 24-trial budget short of saturation (measured
    acceptance 0.329 at 24 vs 0.368 at 50 trials, ~4.5 sigma at this N)."""
    boxes = np.array([[0.4, 0.4, 0.65, 0.65]], np.float32)
    valid = np.ones(1, bool)
    n = 12000
    _, _, a50 = _run_oracle(boxes, valid, n, 50, seed=2)
    _, _, a24 = _run_oracle(boxes, valid, n, 24, seed=3)
    _, _, aj = _run_jax(boxes, valid, n, seed=4)
    assert augment.NUM_TRIALS == 50
    # 24 trials accept measurably less often than 50 on this scene...
    assert a50.mean() - a24.mean() > 0.025
    # ...and the jitted sampler tracks the 50-trial oracle, not the 24.
    assert abs(aj.mean() - a50.mean()) < 0.02
    assert abs(aj.mean() - a24.mean()) > 0.025


def test_zero_gt_scene_never_crops():
    """With no valid gt there is no center to contain: every non-skip
    constraint must fall back to identity on both sides."""
    boxes = np.zeros((2, 4), np.float32)
    valid = np.zeros(2, bool)
    jr, _, ja = _run_jax(boxes, valid, 500, seed=5)
    orr, _, oa = _run_oracle(boxes, valid, 500, augment.NUM_TRIALS, seed=6)
    assert not ja.any() and not oa.any()
    assert np.all(_masks(None, None, jr)) and np.all(_masks(None, None, orr))


def test_box_survival_rate_matches_geometric_oracle():
    """The verdict's enumerated metric the sampler-level tests imply but
    don't measure directly: the fraction of gt boxes surviving the FULL
    geometric chain (expand with prob 1/2 -> crop in post-expand coords
    -> center filter) must match a sequential numpy oracle of the same
    chain. Tiny 8x8 images keep the vmapped resample cheap — survival
    depends only on the regions, not pixels."""
    boxes = np.array([[0.1, 0.1, 0.35, 0.4], [0.55, 0.5, 0.9, 0.95],
                      [0.3, 0.35, 0.65, 0.6]], np.float32)
    labels = np.array([3, 7, 12], np.int32)
    n = 4000

    # jax side: full augment_image over n seeds
    img = jnp.zeros((8, 8, 3), jnp.float32)
    keys = jax.random.split(jax.random.key(42), n)
    _, _, out_labels = jax.jit(jax.vmap(
        lambda k: augment.augment_image(
            k, img, jnp.asarray(boxes), jnp.asarray(labels))))(keys)
    surv_jax = float((np.asarray(out_labels) > 0).mean())

    # oracle: same chain sequentially in numpy
    rng = np.random.default_rng(99)
    kept = 0
    for _ in range(n):
        if rng.uniform() < 0.5:                        # expand prob 1/2
            ratio = rng.uniform(1.0, 4.0)
            py = rng.uniform() * (ratio - 1.0)
            px = rng.uniform() * (ratio - 1.0)
            exp = np.array([-py, -px, ratio, ratio])
        else:
            exp = np.array([0.0, 0.0, 1.0, 1.0])
        shift = np.array([exp[0], exp[1], exp[0], exp[1]])
        scale = np.array([exp[2], exp[3], exp[2], exp[3]])
        boxes_e = (boxes - shift) / scale
        crop, _ = oracle_sample_crop(rng, boxes_e, np.ones(3, bool),
                                     augment.NUM_TRIALS)
        region = np.array([exp[0] + crop[0] * exp[2],
                           exp[1] + crop[1] * exp[3],
                           crop[2] * exp[2], crop[3] * exp[3]])
        b = (boxes - np.array([region[0], region[1], region[0], region[1]])
             ) / np.array([region[2], region[3], region[2], region[3]])
        cy = (b[:, 0] + b[:, 2]) / 2.0
        cx = (b[:, 1] + b[:, 3]) / 2.0
        kept += int(np.sum((cy > 0) & (cy < 1) & (cx > 0) & (cx < 1)))
    surv_oracle = kept / (n * len(boxes))

    # two-sample sigma <= ~0.008 at n*3 Bernoulli-ish trials
    assert abs(surv_jax - surv_oracle) < 0.035, (surv_jax, surv_oracle)
