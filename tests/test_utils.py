"""Utility layer tests: metrics logging, drawing, io path conventions."""

import json
import os

import numpy as np

from tfssd_tpu.utils.drawing import class_colors, draw_predictions
from tfssd_tpu.utils.io import (
    get_log_path,
    get_model_path,
    handle_args,
    is_valid_backbone,
)
from tfssd_tpu.utils.metrics import MetricsLogger, StepTimer


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path))
    log.log(1, {"loss": 2.0}, prefix="train/")
    log.log(2, {"val_loss": 1.5})
    log.close()
    lines = [json.loads(line) for line in open(log.path)]
    assert lines[0]["train/loss"] == 2.0 and lines[0]["step"] == 1
    assert lines[1]["val_loss"] == 1.5


def test_step_timer():
    t = StepTimer(skip=1)
    t.start()
    for _ in range(5):
        t.tick()
    s = t.summary(items_per_step=4)
    assert s["steps"] == 4
    assert s["items_per_sec"] > 0
    assert s["p50_s"] <= s["p99_s"] + 1e-9


def test_drawing(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    out = str(tmp_path / "out.png")
    res = draw_predictions(
        img,
        boxes=np.asarray([[0.1, 0.1, 0.5, 0.5], [0, 0, 0, 0]]),
        scores=np.asarray([0.9, 0.0]),
        classes=np.asarray([3, 0]),
        labels=["bg"] + [f"c{i}" for i in range(1, 21)],
        path=out,
    )
    assert os.path.exists(out)
    arr = np.asarray(res)
    assert arr.shape == (64, 64, 3)
    assert arr.sum() > 0  # something was drawn
    assert len(class_colors(20)) == 20
    assert len(set(class_colors(20))) == 20


def test_io_paths(tmp_path):
    assert is_valid_backbone("vgg16") and not is_valid_backbone("resnet")
    p = get_model_path("vgg16", str(tmp_path / "trained"))
    assert p.endswith("ssd_vgg16") and os.path.isdir(os.path.dirname(p))
    lp = get_log_path("vgg16", str(tmp_path / "logs"))
    assert os.path.isdir(lp)


def test_handle_args_surface():
    parser = handle_args()
    args = parser.parse_args(["--backbone", "vgg16", "--batch-size", "8"])
    assert args.backbone == "vgg16" and args.batch_size == 8
    args = parser.parse_args([])
    assert args.backbone == "mobilenet_v2"  # reference default


def test_metrics_logger_tensorboard_mirror(tmp_path):
    import glob
    log = MetricsLogger(str(tmp_path), tensorboard=True)
    log.log(3, {"loss": 1.25}, prefix="train/")
    log.close()
    # JSONL always written
    assert json.loads(open(log.path).readline())["train/loss"] == 1.25
    # events file written when TF is available
    try:
        import tensorflow  # noqa: F401
        assert glob.glob(str(tmp_path / "events.out.tfevents.*"))
    except ImportError:
        pass


def test_cli_honors_platform_env():
    # JAX_PLATFORMS=cpu must actually select CPU when the CLIs are
    # imported (r4 regression: this image's sitecustomize pins the axon
    # TPU plugin through jax.config, and backend-initializing imports
    # made the CLIs' late config update a no-op, so "CPU" runs silently
    # used the TPU). Subprocess: the fix lives at module import time.
    import subprocess
    import sys

    code = ("import trainer, predictor, jax; "
            "assert jax.default_backend() == 'cpu', jax.default_backend()")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-800:]


def test_profiling_surface(tmp_path):
    import jax
    from tfssd_tpu.utils.profiling import (
        device_memory_stats, enable_debug_nans, step_annotation, trace)

    with trace(str(tmp_path / "prof")):
        with step_annotation("step", 0):
            jax.block_until_ready(jax.numpy.ones(8) * 2)
    import glob
    assert glob.glob(str(tmp_path / "prof" / "**" / "*"), recursive=True)

    enable_debug_nans(True)
    try:
        import pytest as _pytest
        with _pytest.raises(FloatingPointError):
            jax.block_until_ready(jax.numpy.log(-jax.numpy.ones(4)))
    finally:
        enable_debug_nans(False)

    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_jax_cache_size_budget():
    # The committed .jax_cache/ (driver dryrun warm-start) must not grow
    # silently: entries are keyed to exact jax/XLA builds, so stale
    # blobs accumulate invisibly. Budget enforced here AND by
    # tools/prune_jax_cache.py (which also regenerates the cache).
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from prune_jax_cache import BUDGET_BYTES, CACHE, cache_size

    assert os.path.isdir(CACHE), "committed dryrun warm cache is missing"
    size = cache_size()
    assert size <= BUDGET_BYTES, (
        f".jax_cache is {size/2**20:.1f} MB > "
        f"{BUDGET_BYTES/2**20:.0f} MB budget; run "
        f"`python tools/prune_jax_cache.py --regen` and commit")
