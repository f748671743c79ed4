"""Data layer tests: synthetic scenes, batching/padding, augmentation
invariants (SURVEY.md §4 item 2)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

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
