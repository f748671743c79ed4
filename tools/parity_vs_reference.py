"""Output-parity harness vs the reference implementation.

SURVEY.md §4 item 7 / BASELINE north_star: "fixed image + fixed weights
-> reference boxes/scores vs ours within fp tolerance". The reference
mount (/root/reference) was empty in rounds 1-2, so this harness is
pre-built to make the SURVEY §0 standing order ONE command the moment
the mount is populated:

    python tools/parity_vs_reference.py --backbone mobilenet_v2

Real mode (populated mount) runs the stages in anchors -> weights ->
outputs order (each later stage is meaningless if an earlier one fails),
defensively and with precise diagnostics at every step that depends on an
[M]-confidence SURVEY claim:

  0. PRIOR BOXES FIRST (SURVEY §7: "the parity anchor"): the reference's
     `generate_prior_boxes(feature_map_shapes, aspect_ratios)` vs our
     `generate_anchors(cfg)`, compared elementwise to 1e-6. This settles
     the [M] anchor-scale claims (e.g. the VGG16 s_k schedule,
     VERDICT r2 weak #7) instantly — a mismatch exits 5 with the first
     divergent prior per feature map and both scale schedules printed;
  1. import the reference's modules (utils.train_utils, utils.bbox_utils,
     models.ssd_<backbone>, models.decoder) from the mount;
  2. build its decoder model and load its trained h5 weights
     (trained/ssd_<backbone>_model_weights.h5, io_utils.get_model_path);
  3. port the SAME weights into our Flax model (trunk via
     utils/port_weights.py, extras/heads via --layer-map JSON once the
     reference's layer names are known — unmapped weights are inventoried
     and the run exits 3 with the exact name/shape table to fill in);
  4. run both on identical fixed images and compare detections:
     same class, IoU > --iou-tol, |score delta| < --score-tol. The ±1
     class-id convention is AUTO-DETECTED (the offset of {-1, 0, +1}
     that maximizes matches on the first image is applied everywhere and
     reported) rather than assumed — pass --class-offset to pin it.

Exit codes: 0 parity PASS, 1 parity FAIL, 2 mount empty/unreadable,
3 weight porting incomplete (diagnostic inventory printed), 4 reference
API shape unexpected (symbol-by-symbol error printed), 5 prior-box
mismatch (stage 0).

Mock mode (--mock, runnable today) drives the same comparison machinery
against a TF/Keras "reference" built in-process: a randomly-initialized
keras.applications trunk stands in for the reference model, its ported
Flax twin must reproduce the tap feature maps, and the detection
comparator is self-checked (identical sets match; perturbed sets are
rejected). This is what tests/test_parity_harness.py runs in CI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DEFAULT_REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# Detection comparison (pure numpy — unit-testable without TF or a mount)
# ---------------------------------------------------------------------------

def _iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two [ymin, xmin, ymax, xmax] boxes."""
    yx1 = np.maximum(a[:2], b[:2])
    yx2 = np.minimum(a[2:], b[2:])
    inter = float(np.prod(np.clip(yx2 - yx1, 0.0, None)))
    area = (float(np.prod(np.clip(a[2:] - a[:2], 0.0, None)))
            + float(np.prod(np.clip(b[2:] - b[:2], 0.0, None))))
    return inter / max(area - inter, 1e-12)


def compare_detections(ref: dict, ours: dict, score_threshold: float = 0.3,
                       iou_tol: float = 0.95, score_tol: float = 1e-2):
    """Greedy one-to-one match of reference detections against ours.

    ref/ours: {"boxes": (N,4), "scores": (N,), "classes": (N,)} for ONE
    image (fixed-size NMS output; entries below score_threshold ignored).
    Returns (ok, report dict). A reference detection matches an unused
    ours-detection of the same class with IoU > iou_tol and score delta
    < score_tol; parity requires every above-threshold detection on
    EITHER side to be matched (no missing, no spurious).
    """
    def keep(d):
        idx = np.nonzero(np.asarray(d["scores"]) >= score_threshold)[0]
        order = idx[np.argsort(-np.asarray(d["scores"])[idx])]
        return (np.asarray(d["boxes"], np.float64)[order],
                np.asarray(d["scores"], np.float64)[order],
                np.asarray(d["classes"]).astype(np.int64)[order])

    rb, rs, rc = keep(ref)
    ob, os_, oc = keep(ours)
    used = np.zeros(len(os_), dtype=bool)
    matched = 0
    max_iou_dev = 0.0
    max_score_dev = 0.0
    misses = []
    for i in range(len(rs)):
        best_j, best_iou = -1, 0.0
        for j in range(len(os_)):
            if used[j] or oc[j] != rc[i]:
                continue
            v = _iou(rb[i], ob[j])
            if v > best_iou:
                best_iou, best_j = v, j
        score_dev = (abs(rs[i] - os_[best_j]) if best_j >= 0 else np.inf)
        if best_j >= 0 and best_iou >= iou_tol and score_dev <= score_tol:
            used[best_j] = True
            matched += 1
            max_iou_dev = max(max_iou_dev, 1.0 - best_iou)
            max_score_dev = max(max_score_dev, score_dev)
        else:
            misses.append({"side": "reference", "cls": int(rc[i]),
                           "score": float(rs[i]), "best_iou": float(best_iou),
                           "score_dev": float(score_dev)})
    spurious = [{"side": "ours", "cls": int(oc[j]), "score": float(os_[j])}
                for j in range(len(os_)) if not used[j]]
    ok = not misses and not spurious
    return ok, {"ref_detections": int(len(rs)), "our_detections": int(len(os_)),
                "matched": matched, "max_iou_dev": max_iou_dev,
                "max_score_dev": max_score_dev, "missing": misses,
                "spurious": spurious}


# ---------------------------------------------------------------------------
# Reference loading (defensive: every SURVEY [M]-confidence symbol gets a
# candidate list and a precise error)
# ---------------------------------------------------------------------------

class ReferenceAPIError(RuntimeError):
    pass


def _ref_import(name: str):
    import importlib
    try:
        return importlib.import_module(name)
    except Exception as e:  # noqa: BLE001 — report and continue candidates
        raise ReferenceAPIError(
            f"could not import reference module '{name}': {e!r}") from e


def _get(mod, *candidates: str):
    for c in candidates:
        fn = getattr(mod, c, None)
        if fn is not None:
            return fn
    raise ReferenceAPIError(
        f"none of {candidates} found in reference module "
        f"{mod.__name__}; its symbols: "
        f"{[s for s in dir(mod) if not s.startswith('_')]}")


def load_reference(ref_root: str, backbone: str, weights_path: str | None):
    """Build the reference's decoder model with trained weights loaded.

    Returns (predict_fn(images_np) -> (boxes, scores, classes), hyper).
    SURVEY.md §2 #2/#6: predictor.py builds get_model + load_weights +
    get_decoder_model; NMS output is tf combined_non_max_suppression's
    (nmsed_boxes, nmsed_scores, nmsed_classes[, valid]).
    """
    sys.path.insert(0, ref_root)
    try:
        train_utils = _ref_import("utils.train_utils")
        bbox_utils = _ref_import("utils.bbox_utils")
        decoder_mod = _ref_import("models.decoder")
        model_mod = _ref_import(f"models.ssd_{backbone}")

        get_hp = _get(train_utils, "get_hyper_params")
        hyper = get_hp(backbone)
        hyper.setdefault("total_labels", 21)

        get_model = _get(model_mod, "get_model")
        ref_model = get_model(hyper)
        init_model = getattr(model_mod, "init_model", None)
        if init_model is not None:
            init_model(ref_model)

        if weights_path is None:
            weights_path = os.path.join(
                ref_root, "trained", f"ssd_{backbone}_model_weights.h5")
        if not os.path.exists(weights_path):
            raise ReferenceAPIError(
                f"reference weights not found at {weights_path}; pass "
                f"--weights (random-weight parity is meaningless: both "
                f"sides must share ONE trained checkpoint)")
        ref_model.load_weights(weights_path)

        gen_priors = _get(bbox_utils, "generate_prior_boxes",
                          "generate_base_prior_boxes", "generate_anchors")
        priors = gen_priors(hyper["feature_map_shapes"],
                            hyper["aspect_ratios"])
        get_decoder = _get(decoder_mod, "get_decoder_model")
        decoder_model = get_decoder(ref_model, priors, hyper)
    finally:
        sys.path.remove(ref_root)

    def predict(images_np: np.ndarray):
        out = decoder_model.predict(images_np, verbose=0)
        if len(out) == 4:  # (boxes, scores, classes, valid)
            out = out[:3]
        boxes, scores, classes = (np.asarray(o) for o in out)
        return boxes, scores, classes

    return predict, hyper, ref_model, np.asarray(priors)


def compare_priors(ref_priors: np.ndarray, cfg, atol: float = 1e-6) -> bool:
    """Stage 0: elementwise prior-box comparison (SURVEY §7's parity
    anchor). Prints, per feature map, the first divergent prior with both
    sides' corners, plus both scale schedules — the exact data needed to
    settle the [M] anchor-scale claims (VERDICT r2 weak #7)."""
    from tfssd_tpu.ops.boxes import generate_anchors

    ours = np.asarray(generate_anchors(cfg))
    print(f"[stage 0] prior boxes: reference {ref_priors.shape} vs ours "
          f"{ours.shape}")
    if ref_priors.shape != ours.shape:
        print(f"  COUNT MISMATCH — our per-map anchor counts: "
              f"{cfg.anchors_per_map}; our scales: "
              f"{tuple(round(s, 4) for s in cfg.map_scales)}")
        return False
    dev = np.abs(ref_priors - ours)
    if float(dev.max()) <= atol:
        print(f"  MATCH (max |dev| = {float(dev.max()):.2e})")
        return True
    # locate first divergence per feature map
    bounds = np.cumsum((0,) + cfg.anchors_per_map)
    bad = np.nonzero(dev.max(axis=-1) > atol)[0]
    print(f"  MISMATCH: {len(bad)}/{len(ours)} priors differ "
          f"(max |dev| = {float(dev.max()):.4f})")
    for m in range(len(cfg.anchors_per_map)):
        in_map = bad[(bad >= bounds[m]) & (bad < bounds[m + 1])]
        if len(in_map) == 0:
            continue
        i = int(in_map[0])
        print(f"  map {m} ({cfg.feature_map_shapes[m]}x"
              f"{cfg.feature_map_shapes[m]}): first divergent prior "
              f"#{i}: ref={np.round(ref_priors[i], 5).tolist()} "
              f"ours={np.round(ours[i], 5).tolist()} "
              f"({len(in_map)} differ in this map)")
    print(f"  our scale schedule: "
          f"{tuple(round(s, 4) for s in cfg.map_scales)} — if the "
          f"reference's generate_prior_boxes uses a different s_k "
          f"schedule, override SSDConfig.scales to its values.")
    return False


def port_reference_weights(ref_model, cfg, variables, layer_map_path=None):
    """Port ALL reference weights into our variable tree.

    Trunk layers reuse utils/port_weights.py (keras.applications names,
    [H] confidence). Extras + multibox heads carry reference-specific
    layer names ([M] confidence — unverifiable while the mount is empty),
    so they go through a user-supplied --layer-map JSON of
    {reference_layer_name: "our/param/path"}. Anything unmapped is
    inventoried; the caller exits 3 with the table so the next session
    can fill the map in minutes.
    """
    from tfssd_tpu.utils.port_weights import (
        graft, keras_model_weights, port_mobilenet_v2, port_vgg16)

    class _Recording(dict):
        """Records which reference weight names the trunk porter consumed,
        so everything left over is exactly the extras/heads inventory."""

        def __init__(self, base):
            super().__init__(base)
            self.used = set()

        def __getitem__(self, key):
            self.used.add(key)
            return super().__getitem__(key)

    weights = _Recording(keras_model_weights(ref_model))
    porter = (port_mobilenet_v2 if cfg.backbone == "mobilenet_v2"
              else port_vgg16)
    tree = porter(weights)
    variables = graft(variables, tree)

    def flatten(prefix, t, out):
        for k, v in t.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                flatten(p, v, out)
            else:
                out[p] = v
        return out

    layer_map = {}
    if layer_map_path:
        with open(layer_map_path) as f:
            layer_map = json.load(f)

    flat_vars = flatten("", variables["params"], {})
    unmapped_ref = []
    for name, arr in weights.items():
        if name in weights.used:
            continue  # trunk layer, already grafted
        target = layer_map.get(name)
        if target is None:
            unmapped_ref.append((name, tuple(arr.shape)))
            continue
        # apply mapped leaf
        node = variables["params"]
        parts = target.split("/")
        for p in parts[:-1]:
            node = node[p]
        if tuple(node[parts[-1]].shape) != tuple(arr.shape):
            raise ReferenceAPIError(
                f"layer-map shape mismatch: reference {name} {arr.shape} "
                f"-> {target} {node[parts[-1]].shape}")
        import jax.numpy as jnp
        node[parts[-1]] = jnp.asarray(arr)

    uninitialized = [n for n in flat_vars
                     if n.split("/", 1)[0] != "backbone"
                     and not any(n == lm for lm in layer_map.values())]
    return variables, unmapped_ref, uninitialized


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------

def run_ours(cfg, variables, images_np: np.ndarray):
    import jax
    import jax.numpy as jnp

    from tfssd_tpu.models import get_model, make_predict_fn
    from tfssd_tpu.ops.boxes import generate_anchors

    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    res = predict(variables, jnp.asarray(images_np))
    return (np.asarray(res.boxes), np.asarray(res.scores),
            np.asarray(res.classes))


def fixed_images(n: int, img_size: int, image_dir: str | None = None):
    """Deterministic parity inputs, already preprocessed to [-1, 1]."""
    if image_dir:
        from tfssd_tpu.data import custom_image_generator, get_custom_imgs
        imgs = [ex["image"] for ex in custom_image_generator(
            get_custom_imgs(image_dir), img_size)][:n]
        arr = np.stack(imgs).astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return arr * 2.0 - 1.0
    rng = np.random.default_rng(20260819)
    return rng.uniform(-1, 1, (n, img_size, img_size, 3)).astype(np.float32)


# ---------------------------------------------------------------------------
# Mock mode — exercises the full machinery with an in-process "reference"
# ---------------------------------------------------------------------------

def run_mock(backbone: str = "mobilenet_v2") -> bool:
    """Self-contained check runnable with an empty mount:

    1. trunk parity — a randomly-initialized keras.applications trunk is
       the mock reference; porting it must reproduce the tap feature maps;
    2. comparator sanity — identical detection sets PASS, perturbed-box /
       perturbed-score / dropped-detection sets FAIL.
    """
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    import jax
    import jax.numpy as jnp

    from tfssd_tpu.models.mobilenet_v2 import MobileNetV2Backbone
    from tfssd_tpu.utils.port_weights import (
        graft, keras_model_weights, port_mobilenet_v2)

    ok = True
    print("[mock 1/2] trunk parity vs in-process Keras reference ...")
    keras_model = tf.keras.applications.MobileNetV2(
        input_shape=(96, 96, 3), include_top=False, weights=None)
    tree = port_mobilenet_v2(keras_model_weights(keras_model))
    backbone_mod = MobileNetV2Backbone()
    x = fixed_images(2, 96)
    variables = backbone_mod.init(jax.random.key(0), jnp.asarray(x),
                                  train=False)
    variables = graft(
        {"params": {"backbone": variables["params"]},
         "batch_stats": {"backbone": variables["batch_stats"]}}, tree)
    taps = backbone_mod.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(x), train=False)
    ref_tap = keras_model(x).numpy()
    got = np.asarray(taps[1])
    dev = float(np.max(np.abs(got - ref_tap)))
    print(f"  final tap max |dev| = {dev:.2e} (tol 2e-4 + 1e-3 rel)")
    if not np.allclose(got, ref_tap, atol=2e-4, rtol=1e-3):
        print("  FAIL: ported trunk does not reproduce Keras features")
        ok = False

    print("[mock 2/2] detection comparator self-check ...")
    rng = np.random.default_rng(0)
    n = 12
    boxes = np.sort(rng.uniform(0, 1, (n, 2, 2)), axis=1).reshape(n, 4)
    det = {"boxes": boxes, "scores": np.linspace(0.95, 0.35, n),
           "classes": rng.integers(1, 21, n)}
    same_ok, _ = compare_detections(det, det)
    shifted = {**det, "boxes": boxes + 0.05}
    shift_ok, _ = compare_detections(det, shifted)
    rescored = {**det, "scores": det["scores"] - 0.05}
    rescore_ok, _ = compare_detections(det, rescored)
    dropped = {k: v[:-1] for k, v in det.items()}
    drop_ok, drop_rep = compare_detections(det, dropped)
    print(f"  identical sets match: {same_ok}; shifted rejected: "
          f"{not shift_ok}; rescored rejected: {not rescore_ok}; "
          f"dropped rejected: {not drop_ok} "
          f"(missing={len(drop_rep['missing'])})")
    if not same_ok or shift_ok or rescore_ok or drop_ok:
        ok = False
    print(f"mock parity harness: {'PASS' if ok else 'FAIL'}")
    return ok


# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--reference", default=DEFAULT_REFERENCE)
    p.add_argument("--backbone", default="mobilenet_v2",
                   choices=("mobilenet_v2", "vgg16"))
    p.add_argument("--weights", default=None,
                   help="reference h5 (default: its trained/ dir)")
    p.add_argument("--layer-map", default=None,
                   help="JSON {reference_layer: our/param/path} for the "
                        "extras/heads (trunk maps automatically)")
    p.add_argument("--image-dir", default=None,
                   help="real images for the comparison (default: fixed "
                        "random tensors)")
    p.add_argument("--num-images", type=int, default=4)
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--iou-tol", type=float, default=0.95)
    p.add_argument("--score-tol", type=float, default=1e-2)
    p.add_argument("--class-offset", default="auto",
                   help="'auto' (default: detect the offset in {-1,0,+1} "
                        "that maximizes first-image matches) or an int "
                        "added to the REFERENCE class ids")
    p.add_argument("--mock", action="store_true",
                   help="exercise the machinery without a reference mount")
    args = p.parse_args(argv)

    if args.mock:
        return 0 if run_mock(args.backbone) else 1

    ref = args.reference
    if not os.path.isdir(ref) or not any(
            f.endswith(".py") or os.path.isdir(os.path.join(ref, f))
            for f in os.listdir(ref)):
        print(f"reference mount at {ref} is EMPTY or unreadable — the "
              f"standing order in SURVEY.md §0 cannot run yet. When the "
              f"mount is populated, re-run this command (and fix any "
              f"exit-3/exit-4 diagnostics it prints).")
        return 2

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    try:
        ref_predict, hyper, ref_model, ref_priors = load_reference(
            ref, args.backbone, args.weights)
    except ReferenceAPIError as e:
        print(f"reference API mismatch (update load_reference's candidate "
              f"symbol lists): {e}")
        return 4

    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.models import get_model, init_model

    cfg = get_hyper_params(args.backbone)
    # Stage 0 — anchors before weights before outputs: downstream parity
    # is untestable against mismatched priors.
    if not compare_priors(ref_priors, cfg):
        return 5
    import jax
    variables = init_model(get_model(cfg), jax.random.key(0))
    try:
        variables, unmapped, uninitialized = port_reference_weights(
            ref_model, cfg, variables, args.layer_map)
    except ReferenceAPIError as e:
        print(f"weight porting failed: {e}")
        return 4
    if unmapped or uninitialized:
        print("weight porting INCOMPLETE — fill --layer-map with these:")
        for name, shape in unmapped:
            print(f"  reference layer unmapped: {name}  shape={shape}")
        for name in uninitialized:
            print(f"  our param left at init:  {name}")
        return 3

    images = fixed_images(args.num_images, cfg.img_size, args.image_dir)
    rb, rs, rc = ref_predict(images)
    ob, osc, ocl = run_ours(cfg, variables, images)

    if args.class_offset == "auto":
        # The reference's decoder may emit 0-based foreground ids or the
        # +1-shifted label space ([M] claim, SURVEY §2 #6) — detect
        # instead of assuming: the offset that maximizes first-image
        # matches wins (ties -> 0).
        def matches_at(off: int) -> int:
            _, rep = compare_detections(
                {"boxes": rb[0], "scores": rs[0], "classes": rc[0] + off},
                {"boxes": ob[0], "scores": osc[0], "classes": ocl[0]},
                args.score_threshold, args.iou_tol, args.score_tol)
            return rep["matched"]

        class_offset = max((0, 1, -1), key=matches_at)
        print(f"class-id offset auto-detected: {class_offset:+d} "
              f"(reference ids + offset == our 1-based label space)")
    else:
        class_offset = int(args.class_offset)

    all_ok = True
    for i in range(len(images)):
        ok, rep = compare_detections(
            {"boxes": rb[i], "scores": rs[i],
             "classes": np.asarray(rc[i]) + class_offset},
            {"boxes": ob[i], "scores": osc[i], "classes": ocl[i]},
            args.score_threshold, args.iou_tol, args.score_tol)
        status = "ok" if ok else "MISMATCH"
        print(f"image {i}: {status} matched={rep['matched']}/"
              f"{rep['ref_detections']} max_iou_dev={rep['max_iou_dev']:.4f} "
              f"max_score_dev={rep['max_score_dev']:.4f}")
        if not ok:
            print(json.dumps(rep, indent=2))
            all_ok = False
    print(f"reference output parity: {'PASS' if all_ok else 'FAIL'}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
