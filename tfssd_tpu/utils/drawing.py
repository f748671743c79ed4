"""Qualitative visualization: draw detections on images.

Reference parity: utils/drawing_utils.py — draw_bboxes_with_labels /
draw_predictions: denormalize boxes, per-class colors, rectangle + class
name/score text, save or return a PIL image (SURVEY.md §2 #15).
"""

from __future__ import annotations

import colorsys
from typing import Optional, Sequence

import numpy as np


def class_colors(n: int) -> list:
    """Deterministic visually-distinct per-class RGB colors."""
    return [
        tuple(int(c * 255) for c in colorsys.hsv_to_rgb(i / max(n, 1), 0.9, 0.9))
        for i in range(n)
    ]


def draw_predictions(
    image: np.ndarray,            # (H, W, 3) uint8 or float [0,1]
    boxes: np.ndarray,            # (D, 4) normalized corners
    scores: np.ndarray,           # (D,)
    classes: np.ndarray,          # (D,) label ids (1-based, 0 = padding)
    labels: Optional[Sequence[str]] = None,
    score_threshold: float = 0.5,
    path: Optional[str] = None,
):
    """Draw detections; returns the PIL image (and saves it if `path`).

    Mirror of reference drawing_utils.draw_predictions.
    """
    from PIL import Image, ImageDraw

    if image.dtype != np.uint8:
        image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    img = Image.fromarray(image)
    draw = ImageDraw.Draw(img)
    h, w = image.shape[:2]
    n_classes = (len(labels) if labels else int(classes.max(initial=1)) + 1)
    colors = class_colors(n_classes)
    for box, score, cls in zip(boxes, scores, classes):
        if score < score_threshold or cls <= 0:
            continue
        y0, x0, y1, x1 = box
        rect = [x0 * w, y0 * h, x1 * w, y1 * h]
        color = colors[int(cls) % n_classes]
        draw.rectangle(rect, outline=color, width=2)
        name = labels[int(cls)] if labels else str(int(cls))
        draw.text((rect[0] + 2, rect[1] + 2), f"{name} {score:.2f}",
                  fill=color)
    if path:
        img.save(path)
    return img
