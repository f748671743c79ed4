"""CLI argument handling and path conventions.

Reference parity: utils/io_utils.py — handle_args (argparse with
--backbone, -handle-gpu), is_valid_backbone, get_model_path
("trained/ssd_{backbone}_model_weights.h5"), get_log_path (timestamped
logs/ run dirs). The GPU memory-growth toggle has no TPU counterpart; the
analogous environment glue here is platform selection (JAX_PLATFORMS).
"""

from __future__ import annotations

import argparse
import datetime
import os

VALID_BACKBONES = ("mobilenet_v2", "vgg16", "vgg16_512")


def is_valid_backbone(backbone: str) -> bool:
    """Mirror of reference io_utils.is_valid_backbone."""
    return backbone in VALID_BACKBONES


def handle_args(description: str = "tfssd_tpu") -> argparse.ArgumentParser:
    """Base argparse surface shared by trainer.py / predictor.py (mirror of
    reference io_utils.handle_args; callers add their own flags)."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--backbone", default="mobilenet_v2",
                   choices=VALID_BACKBONES,
                   help="which SSD backbone to use")
    p.add_argument("-handle-gpu", "--handle-gpu", action="store_true",
                   help="accepted for reference-CLI compatibility "
                        "(io_utils.handle_gpu_compatibility enabled GPU "
                        "memory growth in TF; no TPU equivalent is "
                        "needed -- platform selection is JAX_PLATFORMS)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--data-root", action="append", default=None,
                   help="VOCdevkit/VOC2007-style directory, optionally "
                        "with a split as ROOT:SPLIT. Repeatable: "
                        "'--data-root VOC2007:trainval --data-root "
                        "VOC2012:trainval' concatenates datasets (the "
                        "reference's VOC07+12 training composition). "
                        "Omit for the synthetic dataset")
    p.add_argument("--dataset", default="voc",
                   choices=("voc", "synthetic"))
    p.add_argument("--model-dir", default="trained")
    p.add_argument("--log-dir", default="logs")
    return p


def parse_data_root(spec: str, default_split: str):
    """Split a --data-root spec "ROOT[:SPLIT]" into (root, split).

    The part after the last colon is a split name only when it looks like
    one (no path separator), so plain paths keep working.
    """
    root, sep, split = spec.rpartition(":")
    if sep and split and os.sep not in split and root:
        return root, split
    return spec, default_split


def get_model_path(backbone: str, model_dir: str = "trained") -> str:
    """Mirror of reference io_utils.get_model_path — the orbax checkpoint
    directory for a backbone."""
    os.makedirs(model_dir, exist_ok=True)
    return os.path.join(model_dir, f"ssd_{backbone}")


def get_log_path(backbone: str, log_dir: str = "logs") -> str:
    """Mirror of reference io_utils.get_log_path — timestamped run dir."""
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    path = os.path.join(log_dir, f"ssd_{backbone}", stamp)
    os.makedirs(path, exist_ok=True)
    return path
