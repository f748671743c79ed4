"""Data layer tests: synthetic scenes, batching/padding, augmentation
invariants (SURVEY.md §4 item 2)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfssd_tpu.data import (
    SyntheticDataset,
    augment_batch,
    batch_examples,
    get_labels,
    parse_annotation,
    prefetch,
)


def test_synthetic_structure():
    ds = SyntheticDataset(num_examples=8, image_size=300, seed=1)
    ex = next(iter(ds))
    assert ex["image"].shape == (300, 300, 3)
    assert ex["image"].dtype == np.uint8
    assert ex["boxes"].shape[1] == 4
    assert (ex["labels"] >= 1).all() and (ex["labels"] <= 20).all()
    assert (ex["boxes"] >= 0).all() and (ex["boxes"] <= 1).all()
    # deterministic by (seed, index)
    ex2 = SyntheticDataset(num_examples=8, image_size=300, seed=1).example(0)
    np.testing.assert_array_equal(ex["image"], ex2["image"])


def test_batching_pads_and_drops():
    ds = SyntheticDataset(num_examples=10, image_size=64, max_objects=3)
    batches = list(batch_examples(ds, batch_size=4, max_gt=8))
    assert len(batches) == 2  # 10 // 4, remainder dropped
    b = batches[0]
    assert b["image"].shape == (4, 64, 64, 3)
    assert b["boxes"].shape == (4, 8, 4)
    assert b["labels"].shape == (4, 8)
    # padding rows are background
    for i in range(4):
        g = (b["labels"][i] > 0).sum()
        assert (b["boxes"][i, g:] == 0).all()

    kept = list(batch_examples(ds, batch_size=4, max_gt=8,
                               drop_remainder=False))
    assert len(kept) == 3 and kept[-1]["num_valid"] == 2
    assert kept[-1]["image"].shape == (4, 64, 64, 3)


def test_prefetch_preserves_order():
    items = list(range(20))
    assert list(prefetch(iter(items), depth=3)) == items


def test_labels_surface():
    labels = get_labels()
    assert labels[0] == "bg" and len(labels) == 21
    assert labels[15] == "person"


def test_parse_annotation_roundtrip():
    xml = """<annotation>
      <filename>000001.jpg</filename>
      <size><width>200</width><height>100</height><depth>3</depth></size>
      <object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>101</xmax><ymax>51</ymax></bndbox>
      </object>
      <object><name>person</name><difficult>1</difficult>
        <bndbox><xmin>51</xmin><ymin>26</ymin><xmax>151</xmax><ymax>76</ymax></bndbox>
      </object>
    </annotation>"""
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        path = f.name
    try:
        ann = parse_annotation(path, keep_difficult=True)
    finally:
        os.unlink(path)
    assert ann["width"] == 200 and ann["height"] == 100
    np.testing.assert_allclose(ann["boxes"][0], [0.0, 0.0, 0.5, 0.5])
    assert list(ann["labels"]) == [12, 15]  # dog, person (1-based)
    assert list(ann["difficult"]) == [False, True]


# ---- augmentation invariants ----


def _batch(seed=0, b=4, s=96, g=6):
    ds = SyntheticDataset(num_examples=b, image_size=s, max_objects=4,
                          seed=seed)
    batch = next(batch_examples(ds, b, g))
    images = jnp.asarray(batch["image"], jnp.float32) / 255.0
    return images, jnp.asarray(batch["boxes"]), jnp.asarray(batch["labels"])


def test_augment_invariants():
    images, boxes, labels = _batch()
    out_img, out_boxes, out_labels = jax.jit(augment_batch)(
        jax.random.key(3), images, boxes, labels)
    assert out_img.shape == images.shape
    oi, ob, ol = map(np.asarray, (out_img, out_boxes, out_labels))
    assert np.isfinite(oi).all()
    assert (oi >= 0).all() and (oi <= 1).all()
    # boxes stay in [0,1]; padding rows stay zero/background
    assert (ob >= -1e-6).all() and (ob <= 1 + 1e-6).all()
    dead = ol == 0
    assert (ob[dead] == 0).all()
    # surviving boxes are a subset of the original labels per image
    for i in range(ol.shape[0]):
        orig = np.asarray(labels[i])
        surv = ol[i][ol[i] > 0]
        for lab in surv:
            assert lab in orig
    # surviving boxes are non-degenerate
    alive = ~dead
    assert (ob[alive][:, 2] - ob[alive][:, 0] >= 0).all()
    assert (ob[alive][:, 3] - ob[alive][:, 1] >= 0).all()


def test_augment_randomness_and_determinism():
    images, boxes, labels = _batch()
    a1 = augment_batch(jax.random.key(1), images, boxes, labels)
    a2 = augment_batch(jax.random.key(1), images, boxes, labels)
    a3 = augment_batch(jax.random.key(2), images, boxes, labels)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(a3[0]))


def test_augment_keeps_some_objects_on_average():
    # Over a few seeds, augmentation must not wipe out all gt boxes.
    images, boxes, labels = _batch(b=8)
    total_in, total_out = 0, 0
    for seed in range(5):
        _, _, ol = augment_batch(jax.random.key(seed), images, boxes, labels)
        total_in += int((np.asarray(labels) > 0).sum())
        total_out += int((np.asarray(ol) > 0).sum())
    assert total_out > 0.3 * total_in, (total_out, total_in)


def test_parallel_workers_preserve_order_and_content():
    ds = SyntheticDataset(num_examples=12, image_size=64, max_objects=3)
    serial = list(batch_examples(ds, 4, 8, workers=1))
    parallel = list(batch_examples(ds, 4, 8, workers=4))
    assert len(serial) == len(parallel) == 3
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["labels"], b["labels"])
        assert a["ids"] == b["ids"]


def test_parallel_workers_with_shuffle():
    ds = SyntheticDataset(num_examples=16, image_size=64)
    a = list(batch_examples(ds, 4, 8, shuffle_seed=3, workers=4))
    b = list(batch_examples(ds, 4, 8, shuffle_seed=3, workers=1))
    for x, y in zip(a, b):
        assert x["ids"] == y["ids"]  # same permutation regardless of workers


def test_collate_propagates_difficult():
    ds = SyntheticDataset(num_examples=4, image_size=64)
    ex = ds.example(0)
    ex["difficult"] = np.ones(len(ex["labels"]), bool)
    # monkeypatch example 0 via a tiny wrapper dataset
    class DS:
        def __len__(self): return 4
        def example(self, i):
            return ex if i == 0 else ds.example(i)
        def __iter__(self):
            return (self.example(i) for i in range(4))
    b = next(batch_examples(DS(), 4, 8))
    assert b["difficult"].shape == (4, 8)
    g = len(ex["labels"])
    assert b["difficult"][0, :g].all()
    assert not b["difficult"][1:].any()


def test_parse_annotation_default_excludes_difficult():
    xml = """<annotation>
      <filename>x.jpg</filename>
      <size><width>100</width><height>100</height></size>
      <object><name>dog</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>50</xmax><ymax>50</ymax></bndbox>
      </object>
      <object><name>cat</name><difficult>0</difficult>
        <bndbox><xmin>51</xmin><ymin>51</ymin><xmax>99</xmax><ymax>99</ymax></bndbox>
      </object>
    </annotation>"""
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        path = f.name
    try:
        default = parse_annotation(path)              # excludes difficult
        kept = parse_annotation(path, keep_difficult=True)
    finally:
        os.unlink(path)
    assert list(default["labels"]) == [8]             # cat only
    assert list(kept["labels"]) == [12, 8]


def test_prefetch_propagates_exceptions():
    def bad_iter():
        yield 1
        raise RuntimeError("corrupt example")
    it = prefetch(bad_iter(), depth=2)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="corrupt example"):
        list(it)


def _write_fake_voc(root, image_ids, split="trainval", size=32):
    """Minimal VOCdevkit tree: JPEGImages/ + Annotations/ + ImageSets/Main."""
    from PIL import Image

    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    for i, image_id in enumerate(image_ids):
        Image.new("RGB", (size, size), (i * 20 % 255, 0, 0)).save(
            os.path.join(root, "JPEGImages", f"{image_id}.jpg"))
        with open(os.path.join(root, "Annotations",
                               f"{image_id}.xml"), "w") as f:
            f.write(f"""<annotation>
  <filename>{image_id}.jpg</filename>
  <size><width>{size}</width><height>{size}</height><depth>3</depth></size>
  <object><name>cat</name><difficult>0</difficult>
    <bndbox><xmin>2</xmin><ymin>2</ymin><xmax>20</xmax><ymax>20</ymax></bndbox>
  </object>
</annotation>""")
    with open(os.path.join(root, "ImageSets", "Main", f"{split}.txt"),
              "w") as f:
        f.write("\n".join(image_ids) + "\n")


def test_concat_dataset_composes_voc_roots():
    """VOC07+12 composition (reference trainer.py loads voc/2007
    train+validation + voc/2012 trainval concatenated)."""
    from tfssd_tpu.data import ConcatDataset, VOCDataset

    with tempfile.TemporaryDirectory() as tmp:
        r07 = os.path.join(tmp, "VOC2007")
        r12 = os.path.join(tmp, "VOC2012")
        _write_fake_voc(r07, ["000001", "000002", "000003"])
        _write_fake_voc(r12, ["2012_001", "2012_002"])
        d07 = VOCDataset(r07, "trainval", image_size=32)
        d12 = VOCDataset(r12, "trainval", image_size=32)
        ds = ConcatDataset([d07, d12])
        assert len(ds) == 5
        # dispatch across the child boundary
        assert ds.example(2)["id"] == "000003"
        assert ds.example(3)["id"] == "2012_001"
        assert ds.example(4)["id"] == "2012_002"
        ids = [ex["id"] for ex in ds]
        assert ids == ["000001", "000002", "000003", "2012_001", "2012_002"]
        # the batched loader shuffles across the union
        batch = next(batch_examples(ds, batch_size=5, max_gt=4,
                                    shuffle_seed=0))
        assert sorted(batch["ids"]) == sorted(ids)


def test_parse_data_root_specs():
    from tfssd_tpu.utils.io import parse_data_root

    assert parse_data_root("/data/VOC2007", "trainval") == (
        "/data/VOC2007", "trainval")
    assert parse_data_root("/data/VOC2012:train", "trainval") == (
        "/data/VOC2012", "train")
    # a path-looking suffix is not a split
    assert parse_data_root("rel/path", "val") == ("rel/path", "val")


def test_trainer_make_datasets_concatenates():
    import argparse

    from trainer import make_datasets

    with tempfile.TemporaryDirectory() as tmp:
        r07 = os.path.join(tmp, "VOC2007")
        r12 = os.path.join(tmp, "VOC2012")
        _write_fake_voc(r07, ["a1", "a2"], split="trainval")
        _write_fake_voc(r07, ["a3"], split="val")
        _write_fake_voc(r12, ["b1", "b2", "b3"], split="trainval")
        args = argparse.Namespace(
            dataset="voc", data_root=[r07, f"{r12}:trainval"],
            train_split="trainval", val_split="val", synthetic_size=8)
        train, val = make_datasets(args, img_size=32)
        assert len(train) == 5           # 2 (VOC07) + 3 (VOC12)
        assert len(val) == 1             # val comes from the first root
        assert val.example(0)["id"] == "a3"


def test_prefetch_sentinel_put_unblocks_after_consumer_exit():
    """The final sentinel/exception put must not hang a producer whose
    consumer exited between the last drain and iterator exhaustion (the
    consumer's finally-drain runs exactly once)."""
    import threading as _threading
    import time as _time

    release = _threading.Event()

    def gen():
        yield 0
        yield 1
        yield 2
        release.wait(timeout=5)  # keep producer alive past consumer exit

    it = prefetch(gen(), depth=1)
    assert next(it) == 0
    it.close()            # consumer exits; finally-drain runs once
    release.set()         # producer now tries its sentinel put
    deadline = _time.time() + 3
    while _threading.active_count() > 1 and _time.time() < deadline:
        _time.sleep(0.05)
    # stop event lets the timed put give up instead of blocking forever
    assert _threading.active_count() <= 2


def test_prefetch_early_exit_stops_producer():
    import threading as _threading
    produced = []
    def gen():
        for i in range(1000):
            produced.append(i)
            yield i
    before = _threading.active_count()
    it = prefetch(gen(), depth=2)
    for _ in range(3):
        next(it)
    it.close()  # consumer stops early
    import time as _time
    _time.sleep(0.3)
    assert _threading.active_count() <= before + 1
    assert len(produced) < 100  # producer did not run to completion


def test_stack_batches_shapes_and_remainder():
    # trainer.py's --steps-per-call feed: k batches stack into a leading
    # scan axis; a trailing partial group is dropped (the trainer floors
    # steps_per_epoch to a multiple of k).
    from tfssd_tpu.data import SyntheticDataset, batch_examples, stack_batches

    ds = SyntheticDataset(7 * 4, image_size=64, seed=3)
    supers = list(stack_batches(
        batch_examples(ds, 4, 8, workers=1), k=3))
    assert len(supers) == 2  # 7 batches -> 2 full groups of 3, 1 dropped
    s = supers[0]
    assert s["image"].shape == (3, 4, 64, 64, 3)
    assert s["boxes"].shape == (3, 4, 8, 4)
    assert s["labels"].shape == (3, 4, 8)
    assert s["num_valid"] == 12
    assert len(s["ids"]) == 12
    # slices must equal the original batches, in order
    again = list(batch_examples(ds, 4, 8, workers=1))
    np.testing.assert_array_equal(s["image"][1], again[1]["image"])
    np.testing.assert_array_equal(supers[1]["labels"][2],
                                  again[5]["labels"])


def test_stage_arrays_pads_and_keeps_metadata():
    from tfssd_tpu.data import SyntheticDataset, stage_arrays

    ds = SyntheticDataset(10, image_size=64, seed=1)
    host, n = stage_arrays(ds, 8, workers=2, pad_to_multiple=4)
    assert n == 10
    assert host["image"].shape == (12, 64, 64, 3)  # padded to 4-multiple
    assert host["boxes"].shape == (12, 8, 4)
    assert host["difficult"].shape == (12, 8)
    assert len(host["ids"]) == 10
    # padded rows are all-zero / label 0 (background): zero loss, no gts
    assert host["labels"][10:].sum() == 0 and host["image"][10:].sum() == 0
    # rows match direct example access
    ex = ds.example(7)
    np.testing.assert_array_equal(host["image"][7], ex["image"])


def test_take_dataset_head_view():
    # predictor.py --limit stages only the head of the split: the view
    # must expose exactly n examples, identical to direct access, and
    # compose with stage_arrays.
    import pytest as _pytest

    from tfssd_tpu.data import SyntheticDataset, TakeDataset, stage_arrays

    ds = SyntheticDataset(10, image_size=64, seed=1)
    head = TakeDataset(ds, 3)
    assert len(head) == 3
    np.testing.assert_array_equal(head.example(2)["image"],
                                  ds.example(2)["image"])
    with _pytest.raises(IndexError):
        head.example(3)
    # n is clamped to the underlying size
    assert len(TakeDataset(ds, 99)) == 10
    host, n = stage_arrays(head, 8, workers=1, pad_to_multiple=2)
    assert n == 3 and host["image"].shape[0] == 4


def test_make_datasets_voc_without_root_errors():
    # --dataset voc (the default) with no --data-root must fail loudly
    # instead of silently training on synthetic data.
    import argparse

    import pytest as _pytest

    from trainer import make_datasets

    args = argparse.Namespace(dataset="voc", data_root=None,
                              train_split="trainval", val_split="val",
                              synthetic_size=8)
    with _pytest.raises(SystemExit, match="data-root"):
        make_datasets(args, img_size=32)


@pytest.mark.slow
def test_voc_end_to_end_train_and_eval_step():
    # VOC data has never flowed through the TRAIN step in this
    # environment (no VOCdevkit on disk): close the gap with a tiny
    # generated VOCdevkit driven through the full pipeline — VOCDataset
    # decode/resize -> padded batching -> jitted train step (augment +
    # match + loss + Adam) -> eval step -> predict/decode/NMS. Uses the
    # shrunken mobilenet config so the CPU compile stays ~1 min.
    import jax
    import tempfile as _tempfile

    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.data import VOCDataset
    from tfssd_tpu.models import get_model, make_predict_fn
    from tfssd_tpu.ops.boxes import generate_anchors
    from tfssd_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
        preprocess_images,
    )

    with _tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "VOC2007")
        _write_fake_voc(root, [f"{i:06d}" for i in range(1, 9)], size=96)
        ds = VOCDataset(root, "trainval", image_size=96)
        assert len(ds) == 8
        cfg = get_hyper_params(
            "mobilenet_v2", img_size=96,
            feature_map_shapes=(6, 3, 2, 1, 1, 1), max_gt_boxes=4)
        model = get_model(cfg)
        anchors = generate_anchors(cfg)
        opt = make_optimizer(1e-3)
        state = create_train_state(model, jax.random.key(0), opt)
        batch = next(batch_examples(ds, 8, cfg.max_gt_boxes,
                                    shuffle_seed=0, workers=2))
        db = {k: jnp.asarray(batch[k])
              for k in ("image", "boxes", "labels")}
        step = jax.jit(make_train_step(model, anchors, opt, augment=True))
        new_state, metrics = step(state, db, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["num_pos"]) > 0  # the cat boxes matched
        ev = jax.jit(make_eval_step(model, anchors))(new_state, db)
        assert np.isfinite(float(ev["loss"]))
        predict = jax.jit(make_predict_fn(model, anchors, cfg))
        res = predict({"params": new_state.params,
                       "batch_stats": new_state.batch_stats},
                      preprocess_images(db["image"]))
        assert res.boxes.shape[0] == 8
        assert np.all(np.asarray(res.boxes) >= 0)
