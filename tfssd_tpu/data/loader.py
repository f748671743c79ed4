"""Host-side batching: examples -> padded numpy batches -> device.

Reference parity: utils/data_utils.py get_data_types/get_data_shapes/
get_padding_values + `padded_batch` and train_utils.generator — the
reference pads the variable per-image gt count inside tf.data; here a
thin numpy batcher pads gts to the static `max_gt_boxes` (the shape jit
wants) and a double-buffered prefetcher overlaps host work with device
compute.

Preprocessing parity (data_utils.preprocessing): images are scaled to
[-1, 1] at the device boundary (done in the jitted step: x * 2 - 1 on the
[0, 1] float input) so host->device transfer stays uint8-sized when the
source is uint8.
"""

from __future__ import annotations

import itertools
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from queue import Full, Queue
from typing import Dict, Iterable, Iterator, Optional, Sequence

import numpy as np


def _parallel_examples(dataset, order: Sequence[int],
                       workers: int) -> Iterator[Dict]:
    """Decode examples with a thread pool, preserving `order`.

    The reference delegates this to tf.data's C++ threadpool; here a
    ThreadPoolExecutor gives the same parallel JPEG decode (PIL releases
    the GIL inside libjpeg) with a bounded 2*workers lookahead.
    """
    ex = ThreadPoolExecutor(max_workers=workers)
    futures = deque()
    it = iter(order)
    try:
        for i in itertools.islice(it, workers * 2):
            futures.append(ex.submit(dataset.example, int(i)))
        while futures:
            out = futures.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                futures.append(ex.submit(dataset.example, int(nxt)))
            yield out
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


class ConcatDataset:
    """Concatenation of random-access datasets into one.

    Reference parity: trainer.py loads VOC07 train+validation AND VOC12
    trainval and concatenates them (`data_utils.get_dataset` over
    "voc/2007" + "voc/2012"); this is the equivalent for raw-VOCdevkit
    datasets. `len` is the sum; `example(i)` dispatches into the child
    that owns global index i, so the loader's shuffle permutes across the
    union and parallel decode workers keep working unchanged.
    """

    def __init__(self, datasets: Sequence):
        if not datasets:
            raise ValueError("ConcatDataset needs at least one dataset")
        for d in datasets:
            if not hasattr(d, "example") or not hasattr(d, "__len__"):
                raise TypeError(
                    f"ConcatDataset children need random access "
                    f"(__len__ + example); got {type(d).__name__}")
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def example(self, index: int) -> Dict:
        if not 0 <= index < len(self):
            raise IndexError(index)
        child = int(np.searchsorted(self._offsets, index, side="right")) - 1
        return self.datasets[child].example(index - int(self._offsets[child]))

    def __iter__(self) -> Iterator[Dict]:
        for i in range(len(self)):
            yield self.example(i)


class TakeDataset:
    """Head view of a random-access dataset: the first `n` examples.

    Lets callers with a --limit stage/decode only the rows they will
    consume (predictor.py device-cache path) instead of the whole split.
    """

    def __init__(self, dataset, n: int):
        self.dataset = dataset
        self.n = max(0, min(int(n), len(dataset)))

    def __len__(self) -> int:
        return self.n

    def example(self, index: int) -> Dict:
        if not 0 <= index < self.n:
            raise IndexError(index)
        return self.dataset.example(index)

    def __iter__(self) -> Iterator[Dict]:
        for i in range(self.n):
            yield self.example(i)


def pad_gt(boxes: np.ndarray, labels: np.ndarray, max_gt: int):
    """Pad/truncate (G,4)/(G,) gt arrays to the static max_gt rows."""
    g = min(len(labels), max_gt)
    out_boxes = np.zeros((max_gt, 4), np.float32)
    out_labels = np.zeros((max_gt,), np.int32)
    out_boxes[:g] = boxes[:g]
    out_labels[:g] = labels[:g]
    return out_boxes, out_labels


def batch_examples(
    dataset: Iterable[Dict],
    batch_size: int,
    max_gt: int,
    *,
    repeat: bool = False,
    shuffle_seed: Optional[int] = None,
    drop_remainder: bool = True,
    workers: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield batches {'image' (B,S,S,3) uint8, 'boxes' (B,G,4) float32,
    'labels' (B,G) int32, 'ids' list}. Short final batches are padded with
    zero images (and all-background gts) when not dropped so shapes stay
    static for jit."""
    rng = (np.random.default_rng(shuffle_seed)
           if shuffle_seed is not None else None)
    random_access = hasattr(dataset, "example")
    if not random_access and (shuffle_seed is not None or workers > 1):
        # Shuffling / parallel decode need random access; silently
        # yielding file-order single-threaded batches would degrade SGD
        # with no visible failure (r5 review).
        raise ValueError(
            "shuffle_seed/workers require a random-access dataset "
            "(with .example); got a plain iterable")

    def one_pass():
        if random_access:
            order = (rng.permutation(len(dataset)) if rng is not None
                     else np.arange(len(dataset)))
            if workers > 1:
                return _parallel_examples(dataset, order, workers)
            return (dataset.example(int(i)) for i in order)
        return iter(dataset)

    passes = itertools.count() if repeat else range(1)
    for _ in passes:
        buf = []
        for ex in one_pass():
            buf.append(ex)
            if len(buf) == batch_size:
                yield _collate(buf, max_gt)
                buf = []
        if buf and not drop_remainder:
            yield _collate(buf, max_gt, pad_to=batch_size)


def _collate(examples, max_gt: int, pad_to: Optional[int] = None):
    n = len(examples)
    total = pad_to or n
    s = examples[0]["image"].shape[0]
    images = np.zeros((total, s, s, 3), examples[0]["image"].dtype)
    boxes = np.zeros((total, max_gt, 4), np.float32)
    labels = np.zeros((total, max_gt), np.int32)
    difficult = np.zeros((total, max_gt), bool)
    ids = []
    for i, ex in enumerate(examples):
        images[i] = ex["image"]
        boxes[i], labels[i] = pad_gt(ex["boxes"], ex["labels"], max_gt)
        d = np.asarray(ex.get("difficult",
                              np.zeros(len(ex["labels"]), bool)))
        g = min(len(d), max_gt)
        difficult[i, :g] = d[:g]
        ids.append(ex.get("id", str(i)))
    return {"image": images, "boxes": boxes, "labels": labels,
            "difficult": difficult, "ids": ids, "num_valid": n}


def stage_arrays(dataset, max_gt: int, *, workers: int = 8,
                 pad_to_multiple: Optional[int] = None):
    """Decode the WHOLE dataset into contiguous host arrays once:
    ({'image' (N,S,S,3) uint8, 'boxes' (N,G,4), 'labels' (N,G)}, n_real).

    Feed for the device-resident data path (train.make_cached_train_step):
    the caller ships these to HBM in one transfer per key and gathers
    batches on device. `pad_to_multiple` appends all-zero rows (label 0,
    zero loss) so N divides the batch size for static-shape eval slicing;
    n_real is the row count before padding."""
    n = len(dataset)
    total = n
    if pad_to_multiple:
        total = -(-n // pad_to_multiple) * pad_to_multiple
    first = dataset.example(0)
    s = first["image"].shape[0]
    images = np.zeros((total, s, s, 3), first["image"].dtype)
    boxes = np.zeros((total, max_gt, 4), np.float32)
    labels = np.zeros((total, max_gt), np.int32)
    difficult = np.zeros((total, max_gt), bool)
    ids = []
    # reuse the shape probe as row 0 instead of decoding it twice
    it = itertools.chain(
        [first],
        _parallel_examples(dataset, np.arange(1, n), workers)
        if workers > 1 else (dataset.example(i) for i in range(1, n)))
    for i, ex in enumerate(it):
        images[i] = ex["image"]
        boxes[i], labels[i] = pad_gt(ex["boxes"], ex["labels"], max_gt)
        d = np.asarray(ex.get("difficult",
                              np.zeros(len(ex["labels"]), bool)))
        g = min(len(d), max_gt)
        difficult[i, :g] = d[:g]
        ids.append(ex.get("id", str(i)))
    return {"image": images, "boxes": boxes, "labels": labels,
            "difficult": difficult, "ids": ids}, n


def stack_batches(batches: Iterable[Dict], k: int) -> Iterator[Dict]:
    """Stack k consecutive batches into super-batches for
    `train.make_multi_train_step`: array values gain a leading (k,) scan
    axis, `num_valid` becomes the real-image sum, `ids` the concatenated
    list. A trailing group smaller than k is dropped (the trainer floors
    steps_per_epoch to a multiple of k, mirroring drop_remainder)."""
    buf = []
    for b in batches:
        buf.append(b)
        if len(buf) == k:
            out = {key: np.stack([c[key] for c in buf])
                   for key in ("image", "boxes", "labels", "difficult")}
            out["ids"] = [i for c in buf for i in c["ids"]]
            out["num_valid"] = sum(c["num_valid"] for c in buf)
            yield out
            buf = []


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch so host batching overlaps device steps
    (the tf.data threadpool's job in the reference).

    Exceptions raised by the wrapped iterator propagate to the consumer
    (a corrupt input must fail the run, not silently truncate the
    epoch), and an early-exiting consumer (break / --limit) unblocks and
    stops the producer instead of leaking it.
    """
    q: Queue = Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()

    def _put(item) -> bool:
        """Put with stop-check so NO producer put can block forever once
        the consumer has exited (including the final sentinel/exception
        put — the consumer's drain runs only once, after which a plain
        blocking put on a full queue would never return)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(sentinel)
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so a blocked producer can observe the stop event
        try:
            while True:
                q.get_nowait()
        except Exception:
            pass
