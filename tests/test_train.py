"""Training semantics tests: one step decreases loss, overfit a tiny
synthetic set, LR schedule, data-parallel parity on the 8-device mesh,
checkpoint round-trip (SURVEY.md §4 items 3/5/6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfssd_tpu import get_hyper_params
from tfssd_tpu.data import SyntheticDataset, batch_examples
from tfssd_tpu.models import get_model
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.parallel import get_mesh, replicate, shard_batch
from tfssd_tpu.train import (
    TrainState,
    create_train_state,
    get_step_size,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    scheduler,
)


def _tiny_setup(batch_size=4, img_size=96, augment=False):
    # A shrunken mobilenet config: smaller image, fewer anchors, 5 classes.
    cfg = get_hyper_params(
        "mobilenet_v2",
        img_size=img_size,
        feature_map_shapes=(6, 3, 2, 1, 1, 1),
        total_labels=6,
        max_gt_boxes=8,
    )
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt)
    step = make_train_step(model, anchors, opt, augment=augment)
    ds = SyntheticDataset(num_examples=batch_size, image_size=img_size,
                          max_objects=2, seed=7, num_classes=5)
    batch = next(batch_examples(ds, batch_size, cfg.max_gt_boxes))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("image", "boxes", "labels")}
    return cfg, model, anchors, opt, state, step, batch


def test_scheduler_mirrors_reference():
    assert scheduler(0) == pytest.approx(1e-3)
    assert scheduler(79) == pytest.approx(1e-3)
    assert scheduler(80) == pytest.approx(1e-4)
    assert scheduler(110) == pytest.approx(1e-5)
    sched = make_lr_schedule(steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(800)) == pytest.approx(1e-4)
    assert float(sched(1100)) == pytest.approx(1e-5, rel=1e-4)


def test_get_step_size():
    assert get_step_size(100, 32) == 4
    assert get_step_size(96, 32) == 3


@pytest.mark.slow
def test_train_step_decreases_loss_and_updates_state():
    _, _, _, _, state, step, batch = _tiny_setup()
    jstep = jax.jit(step)
    rng = jax.random.key(1)
    s1, m1 = jstep(state, batch, rng)
    assert int(s1.step) == 1
    # params actually moved
    diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree_util.tree_map(lambda a, b: a - b, s1.params, state.params),
        0.0)
    assert diff > 0
    losses = [float(m1["loss"])]
    s = s1
    for _ in range(15):
        s, m = jstep(s, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_multi_step_matches_sequential_single_steps():
    # trainer.py's --steps-per-call path: one lax.scan dispatch of K
    # optimizer steps must reproduce K separate single-step dispatches
    # (same LR schedule positions, same per-step fold_in(rng, step)
    # augmentation draws), or fusing steps silently changes training.
    from tfssd_tpu.train import make_multi_train_step

    cfg, model, anchors, opt, state, step, batch = _tiny_setup(
        batch_size=4, augment=True)
    K = 3
    rng = jax.random.key(5)
    rng_np = np.random.default_rng(3)
    batches = []
    for i in range(K):
        b = dict(batch)
        b["image"] = jnp.asarray(
            rng_np.integers(0, 255, batch["image"].shape, np.uint8))
        batches.append(b)
    superbatch = {k: jnp.stack([b[k] for b in batches]) for k in batch}

    jstep = jax.jit(step)
    s_seq = state
    seq_losses = []
    for b in batches:
        s_seq, m = jstep(s_seq, b, rng)
        seq_losses.append(float(m["loss"]))

    multi = jax.jit(make_multi_train_step(model, anchors, opt,
                                          augment=True))
    s_multi, ms = multi(state, superbatch, rng)

    assert int(s_multi.step) == int(s_seq.step) == K
    # Tolerances: the scan body and the standalone step are separate XLA
    # compilations, so float reduction orders differ; through Adam on the
    # steep early-loss surface that legitimate noise amplifies to ~0.2%
    # by step 2 (step 0 matches exactly). Real bugs (wrong rng slice,
    # batch order, skipped update) move losses by whole units.
    np.testing.assert_allclose(
        np.asarray(ms["loss"]), np.asarray(seq_losses), rtol=1e-2)
    assert abs(float(ms["loss"][0]) - seq_losses[0]) < 1e-4
    # Params: Adam's early updates are ~±lr (1e-3) per step regardless of
    # gradient magnitude, so a near-zero gradient whose SIGN flips under
    # a different reduction order moves a param by up to 2·lr per step —
    # bound the drift in lr quanta, not relative terms.
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=K * 2.5e-3)

    # trainer.py's streamed spc>1 branch shards the super-batch with
    # superbatch_sharding (scan axis whole, batch axis over "data"):
    # the 8-way sharded scan must match the unsharded scan on the same
    # super-batch (batch widened to 8 rows to divide the mesh).
    from tfssd_tpu.parallel import (
        get_mesh,
        replicate,
        shard_batch,
        superbatch_sharding,
    )

    super8 = {k: jnp.concatenate([v, v], axis=1)
              for k, v in superbatch.items()}
    m_plain, ms_plain = multi(state, super8, rng)
    mesh = get_mesh()
    s_state = replicate(mesh, state)
    s_super = shard_batch(mesh, super8,
                          sharding=superbatch_sharding(mesh))
    s_sharded, ms_sharded = multi(s_state, s_super, rng)
    assert int(s_sharded.step) == int(m_plain.step) == K
    # Step 0 runs on identical pre-update params: tight. Later steps sit
    # on the steep early-loss surface after Adam's ±lr sign-sensitive
    # updates, and the sharded executable's per-device-partial + psum
    # reduction order differs from the unsharded one — measured drift
    # 4% by step 2; real bugs (wrong shard, dropped psum) move losses
    # by whole units.
    assert abs(float(ms_sharded["loss"][0])
               - float(ms_plain["loss"][0])) < 1e-3
    np.testing.assert_allclose(np.asarray(ms_sharded["loss"]),
                               np.asarray(ms_plain["loss"]), rtol=1e-1)


@pytest.mark.slow
def test_cached_step_matches_streamed_step():
    # trainer.py's --device-cache path: a step fed by on-device gather
    # from the resident dataset must reproduce the step fed the same
    # batch directly; likewise for eval. Run on the 8-device virtual
    # mesh so the sharded-data gather path compiles and executes.
    from tfssd_tpu.data import stage_arrays
    from tfssd_tpu.parallel import get_mesh, replicate, shard_batch
    from tfssd_tpu.train import (
        flatten_images,
        make_cached_eval_step,
        make_cached_train_step,
        make_eval_step,
    )

    cfg, model, anchors, opt, state, step, batch = _tiny_setup(
        batch_size=8, augment=True)
    ds = SyntheticDataset(num_examples=24, image_size=96, max_objects=2,
                          seed=7, num_classes=5)
    data_host, n = stage_arrays(ds, cfg.max_gt_boxes, workers=2)
    assert n == 24
    mesh = get_mesh()
    state = replicate(mesh, state)
    # ship only the array keys (trainer.py does the same): stage_arrays
    # also returns host-side ids/difficult metadata that can't be jitted.
    # Images ship FLAT (N, S*S*3) as trainer.py stages them (the
    # layout-proof gather shape); train.gather_rows reshapes per batch.
    data = shard_batch(mesh, flatten_images({
        k: data_host[k] for k in ("image", "boxes", "labels")}))
    rng = jax.random.key(9)
    idx = np.asarray([3, 17, 5, 0, 23, 9, 11, 2], np.int32)

    direct_batch = shard_batch(mesh, {
        k: data_host[k][idx] for k in ("image", "boxes", "labels")})
    s_direct, m_direct = jax.jit(step)(state, direct_batch, rng)
    cached = jax.jit(make_cached_train_step(model, anchors, opt,
                                            augment=True))
    s_cached, m_cached = cached(state, data, jnp.asarray(idx), rng)
    np.testing.assert_allclose(float(m_cached["loss"]),
                               float(m_direct["loss"]), rtol=1e-4)
    # ±2·lr slack: Adam's first update is ±lr, and a near-zero gradient
    # can flip sign between the two compilations (see the multi-step
    # test). The tight loss match above is the semantic check.
    a = jax.tree_util.tree_leaves(s_direct.params)[0]
    b = jax.tree_util.tree_leaves(s_cached.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=2.5e-3)

    ev = jax.jit(make_eval_step(model, anchors))(state, direct_batch)
    evc = jax.jit(make_cached_eval_step(model, anchors))(
        state, data, jnp.asarray(idx))
    np.testing.assert_allclose(float(evc["loss"]), float(ev["loss"]),
                               rtol=1e-5)
    # 4-D (unflattened) resident data is still supported by train.gather_rows
    data4d = shard_batch(mesh, {
        k: data_host[k] for k in ("image", "boxes", "labels")})
    evc4 = jax.jit(make_cached_eval_step(model, anchors))(
        state, data4d, jnp.asarray(idx))
    np.testing.assert_allclose(float(evc4["loss"]), float(ev["loss"]),
                               rtol=1e-5)

    # trainer.py's one-dispatch validation pass: chunked multi-eval over
    # K index rows must equal K independent cached evals. K=2 with the
    # default chunk of 4 is non-divisible, exercising lax.map's native
    # remainder program (no padding involved).
    from tfssd_tpu.train import make_cached_multi_eval_step

    idx2 = np.stack([idx, idx[::-1].copy()])
    evm = jax.jit(make_cached_multi_eval_step(model, anchors))(
        state, data, jnp.asarray(idx2))
    assert evm["loss"].shape == (2,)
    single = jax.jit(make_cached_eval_step(model, anchors))
    for k in range(2):
        np.testing.assert_allclose(
            float(evm["loss"][k]),
            float(single(state, data, jnp.asarray(idx2[k]))["loss"]),
            rtol=1e-5)


@pytest.mark.slow
def test_ssd512_train_step_smoke():
    # BASELINE #4 as a TRAIN config (VERDICT r3 next #6): one full
    # vgg16_512 train step — 24,564-anchor matching, VGG16-512 fwd/bwd,
    # in-jit augmentation — compiles and runs at batch 1 on CPU
    # (~65 s measured; TPU numbers live in bench.py --config
    # ssd512-train: 181 img/s at batch 16 without remat).
    cfg = get_hyper_params("vgg16_512")
    assert cfg.total_anchors == 24564
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt,
                               batch_size=1)
    ds = SyntheticDataset(1, image_size=cfg.img_size)
    batch = next(batch_examples(ds, 1, cfg.max_gt_boxes))
    db = {k: jnp.asarray(batch[k]) for k in ("image", "boxes", "labels")}
    step = jax.jit(make_train_step(model, anchors, opt, augment=True))
    new_state, metrics = step(state, db, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_overfit_tiny_synthetic():
    # SURVEY.md §4 item 5: overfitting a few images approaches ~0 loss.
    _, _, _, _, state, step, batch = _tiny_setup()
    jstep = jax.jit(step)
    rng = jax.random.key(0)
    s = state
    for _ in range(150):
        s, m = jstep(s, batch, rng)
    assert float(m["loss"]) < 0.6, float(m["loss"])


@pytest.mark.slow
def test_train_to_map_regression():
    """End-to-end accuracy regression gate (VERDICT r1 weak #7): train on
    a tiny synthetic set, then run the full predict (decode + NMS) and
    VOC eval paths and require near-perfect train-set mAP@0.5. Covers
    matching, loss, optimizer, BN statistics, decode, NMS and the
    evaluator wired together; calibrated headroom: measured mAP = 1.0
    at these settings, threshold 0.8.

    bn_momentum=0.8 so the BatchNorm running averages converge within
    200 steps (eval mode uses running stats; the 0.99 default needs the
    reference's multi-epoch schedules). force_match_for_gt guarantees
    every synthetic object has at least one positive anchor on the tiny
    6/3/2/1/1/1 anchor grid.
    """
    from tfssd_tpu.evaluate import evaluate_predictions
    from tfssd_tpu.models import make_predict_fn
    from tfssd_tpu.train import preprocess_images

    cfg = get_hyper_params(
        "mobilenet_v2", img_size=96,
        feature_map_shapes=(6, 3, 2, 1, 1, 1), total_labels=6,
        max_gt_boxes=8, force_match_for_gt=True, bn_momentum=0.8)
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(make_train_step(model, anchors, opt, augment=False))
    ds = SyntheticDataset(num_examples=8, image_size=96, max_objects=2,
                          seed=11, num_classes=5)
    batch = next(batch_examples(ds, 8, cfg.max_gt_boxes))
    jb = {k: jnp.asarray(batch[k]) for k in ("image", "boxes", "labels")}
    rng = jax.random.key(0)
    for _ in range(200):
        state, m = step(state, jb, rng)
    assert np.isfinite(float(m["loss"]))

    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    res = predict({"params": state.params,
                   "batch_stats": state.batch_stats},
                  preprocess_images(jb["image"]))
    gt, det = [], []
    for i in range(8):
        ex = ds.example(i)
        gt.append({"boxes": ex["boxes"], "labels": ex["labels"],
                   "difficult": ex["difficult"]})
        det.append({"boxes": np.asarray(res.boxes[i]),
                    "scores": np.asarray(res.scores[i]),
                    "classes": np.asarray(res.classes[i])})
    out = evaluate_predictions(gt, det, num_classes=5, verbose=False)
    assert out["map"] >= 0.8, out


@pytest.mark.slow
def test_train_to_map_regression_prefilter_active():
    """Accuracy gate that actually exercises the shipped NMS prefilter
    (VERDICT r2 missing #1): 636 anchors > nms_prefilter_anchors=512, so
    the class-agnostic top-M cut is live — unlike the 236-anchor gate
    above, where it no-ops. Trains to convergence on trained (not random)
    scores at the shipped nms_score_threshold=0.0, then asserts
      (a) mAP@0.5 with the shipped prefilter default stays >= 0.8, and
      (b) the prefilter costs ZERO mAP vs the exact prefilter=0 NMS on
          the same trained state (tolerance 1e-3).
    The forward runs once; only decode+NMS differs between variants.
    (The full-2268-anchor/TPU version of this proof on trained scores is
    tools/prefilter_ab.py; its measured result is recorded in
    ARCHITECTURE.md.)
    """
    import jax.numpy as jnp

    from tfssd_tpu.evaluate import evaluate_predictions
    from tfssd_tpu.models.decoder import decode_predictions
    from tfssd_tpu.train import preprocess_images

    cfg = get_hyper_params(
        "mobilenet_v2", img_size=160,
        feature_map_shapes=(10, 5, 3, 2, 1, 1), total_labels=6,
        max_gt_boxes=8, force_match_for_gt=True, bn_momentum=0.8)
    assert cfg.total_anchors == 636
    assert 0 < cfg.nms_prefilter_anchors < cfg.total_anchors
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(make_train_step(model, anchors, opt, augment=False))
    ds = SyntheticDataset(num_examples=8, image_size=160, max_objects=2,
                          seed=13, num_classes=5)
    batch = next(batch_examples(ds, 8, cfg.max_gt_boxes))
    jb = {k: jnp.asarray(batch[k]) for k in ("image", "boxes", "labels")}
    rng = jax.random.key(0)
    for _ in range(200):
        state, m = step(state, jb, rng)
    assert np.isfinite(float(m["loss"]))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    deltas, logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(
        variables, preprocess_images(jb["image"]))
    anchors_j = jnp.asarray(anchors)

    import dataclasses
    cfg_exact = dataclasses.replace(cfg, nms_prefilter_anchors=0)
    res_fast = jax.jit(lambda d, l: decode_predictions(
        anchors_j, d, l, cfg))(deltas, logits)
    res_exact = jax.jit(lambda d, l: decode_predictions(
        anchors_j, d, l, cfg_exact))(deltas, logits)

    def to_eval(res):
        gt, det = [], []
        for i in range(8):
            ex = ds.example(i)
            gt.append({"boxes": ex["boxes"], "labels": ex["labels"],
                       "difficult": ex["difficult"]})
            det.append({"boxes": np.asarray(res.boxes[i]),
                        "scores": np.asarray(res.scores[i]),
                        "classes": np.asarray(res.classes[i])})
        return gt, det

    gt, det_fast = to_eval(res_fast)
    _, det_exact = to_eval(res_exact)
    map_fast = evaluate_predictions(gt, det_fast, num_classes=5,
                                    verbose=False)["map"]
    map_exact = evaluate_predictions(gt, det_exact, num_classes=5,
                                     verbose=False)["map"]
    assert map_fast >= 0.8, (map_fast, map_exact)
    assert abs(map_fast - map_exact) <= 1e-3, (map_fast, map_exact)


@pytest.mark.slow
def test_augmented_step_runs():
    _, _, _, _, state, step, batch = _tiny_setup(augment=True)
    s, m = jax.jit(step)(state, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_eval_step():
    _, model, anchors, _, state, step, batch = _tiny_setup()
    ev = jax.jit(make_eval_step(model, anchors))
    m = ev(state, batch)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_data_parallel_parity():
    # Same batch: 1-device step vs 8-way sharded step must agree closely
    # (SURVEY.md §4 item 6).
    _, _, _, _, state, step, batch = _tiny_setup(batch_size=8)
    rng = jax.random.key(3)
    s_single, m_single = jax.jit(step)(state, batch, rng)

    mesh = get_mesh()
    assert mesh.devices.size == 8
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)
    s_shard, m_shard = jax.jit(step)(state_r, batch_s, rng)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(s_single.params)[0]
    b = jax.tree_util.tree_leaves(s_shard.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from tfssd_tpu.utils.checkpoint import CheckpointManager

    _, _, _, _, state, step, batch = _tiny_setup()
    s1, _ = jax.jit(step)(state, batch, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, s1, val_loss=2.5)
    assert mgr.latest_step() == 1
    restored = mgr.restore(state)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_pack_state_roundtrip_exact():
    # The async save path serializes the TrainState through ONE packed
    # uint8 buffer (bitcast per leaf + concat on device, zero-copy views
    # on host). Every leaf must round-trip bit-exactly, across dtypes
    # (f32 params, i32 step/counts, any bool masks in opt_state).
    from tfssd_tpu.utils.checkpoint import pack_state, unpack_state

    _, _, _, _, state, step, batch = _tiny_setup()
    s1, _ = jax.jit(step)(state, batch, jax.random.key(0))
    packed, treedef, specs = pack_state(s1)
    host = unpack_state(packed, treedef, specs)
    src = jax.tree_util.tree_leaves(s1)
    dst = jax.tree_util.tree_leaves(host)
    assert len(src) == len(dst)
    for a, b in zip(jax.device_get(src), dst):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_save_from_device_restores_like_sync_save(tmp_path):
    # trainer.py checkpoints via the non-blocking save_from_device; a
    # restore must see exactly what a synchronous save would have written,
    # and readers must barrier on the in-flight background fetch.
    from tfssd_tpu.utils.checkpoint import CheckpointManager

    _, _, _, _, state, step, batch = _tiny_setup()
    s1, _ = jax.jit(step)(state, batch, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_from_device(1, s1, val_loss=2.5)
    assert mgr.latest_step() == 1  # flushes the background fetch
    restored = mgr.restore(state)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


@pytest.mark.slow
def test_checkpoint_weights_restore_across_optimizers(tmp_path):
    # predictor.py restores with a *different* optimizer than the trainer
    # used (constant lr vs schedule): weights-only restore must still work.
    from tfssd_tpu.utils.checkpoint import CheckpointManager
    from tfssd_tpu.models import get_model
    from tfssd_tpu.ops.boxes import generate_anchors
    import optax

    cfg = get_hyper_params(
        "mobilenet_v2", img_size=96,
        feature_map_shapes=(6, 3, 2, 1, 1, 1), total_labels=6,
        max_gt_boxes=8)
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    sched_opt = make_optimizer(make_lr_schedule(10))
    state = create_train_state(model, jax.random.key(0), sched_opt)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(5, state, val_loss=1.0)

    fresh = create_train_state(model, jax.random.key(1),
                               make_optimizer(1e-3))
    restored = mgr.restore_weights(fresh)
    assert int(restored.step) == int(state.step)  # state's own step field
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()
