"""Pascal VOC loading from raw VOCdevkit directories.

Reference parity: utils/data_utils.py — the reference uses
`tfds.load("voc/2007"|"voc/2012")`; tensorflow_datasets is not available
in this environment, so this module reads the standard VOCdevkit layout
directly (JPEGImages/ + Annotations/*.xml + ImageSets/Main/<split>.txt),
producing the same per-example structure: image (H, W, 3) uint8, gt boxes
normalized [ymin, xmin, ymax, xmax], integer labels in [1, 20] (0 is
background, matching the reference's `"bg"` prepend in trainer.py).

Also mirrors `get_custom_imgs(path)` / `custom_data_generator` for
arbitrary image folders, and `get_labels` / `get_total_item_size`.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

# The 20 VOC classes (reference: data_utils.get_labels via tfds info);
# index 0 is background ("bg"), as the reference prepends.
VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)
LABELS = ("bg",) + VOC_CLASSES
_NAME_TO_ID = {n: i + 1 for i, n in enumerate(VOC_CLASSES)}


def get_labels() -> List[str]:
    """Mirror of reference data_utils.get_labels (with the bg prepend)."""
    return list(LABELS)


def parse_annotation(xml_path: str, keep_difficult: bool = False) -> Dict:
    """One VOC XML -> {'filename', 'width', 'height', 'boxes' (G,4) normalized
    [ymin,xmin,ymax,xmax] float32, 'labels' (G,) int32, 'difficult' (G,) bool}."""
    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    width = float(size.find("width").text)
    height = float(size.find("height").text)
    boxes, labels, difficult = [], [], []
    for obj in root.iter("object"):
        name = obj.find("name").text.strip().lower()
        if name not in _NAME_TO_ID:
            continue
        diff_node = obj.find("difficult")
        is_diff = diff_node is not None and diff_node.text.strip() == "1"
        if is_diff and not keep_difficult:
            # excluded entirely (training); eval passes keep_difficult=True
            # and ignore-matches them instead
            continue
        bb = obj.find("bndbox")
        # VOC pixel coords are 1-based inclusive. (v - 1) / size on ALL
        # FOUR coords mirrors tensorflow_datasets' voc builder
        # (_get_example_objects: BBox((ymin-1)/h, ..., (ymax-1)/h)) —
        # the exact pipeline the reference trains on. A geometrically
        # "truer" inclusive-extent form would divide the max coords raw,
        # but parity with the reference outranks it; do not "fix".
        xmin = (float(bb.find("xmin").text) - 1.0) / width
        ymin = (float(bb.find("ymin").text) - 1.0) / height
        xmax = (float(bb.find("xmax").text) - 1.0) / width
        ymax = (float(bb.find("ymax").text) - 1.0) / height
        boxes.append([ymin, xmin, ymax, xmax])
        labels.append(_NAME_TO_ID[name])
        difficult.append(is_diff)
    return {
        "filename": root.find("filename").text.strip(),
        "width": int(width),
        "height": int(height),
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        "labels": np.asarray(labels, np.int32),
        "difficult": np.asarray(difficult, bool),
    }


class VOCDataset:
    """Iterable VOC split.

    root: VOCdevkit/VOC2007-style directory (contains JPEGImages/,
    Annotations/, ImageSets/Main/). split: e.g. "trainval", "train",
    "val", "test".
    """

    def __init__(self, root: str, split: str = "trainval",
                 image_size: Optional[int] = None,
                 skip_difficult: bool = True):
        self.root = root
        self.split = split
        self.image_size = image_size
        self.skip_difficult = skip_difficult
        split_file = os.path.join(root, "ImageSets", "Main", f"{split}.txt")
        with open(split_file) as f:
            self.ids = [line.strip().split()[0] for line in f if line.strip()]

    def __len__(self) -> int:
        """Mirror of reference data_utils.get_total_item_size."""
        return len(self.ids)

    def _load_image(self, image_id: str) -> np.ndarray:
        from PIL import Image

        path = os.path.join(self.root, "JPEGImages", f"{image_id}.jpg")
        img = Image.open(path).convert("RGB")
        if self.image_size is not None:
            img = img.resize((self.image_size, self.image_size),
                             Image.BILINEAR)
        return np.asarray(img, np.uint8)

    def example(self, index: int) -> Dict:
        """Random access by index — enables the loader's parallel decode
        workers (PIL releases the GIL inside libjpeg)."""
        image_id = self.ids[index]
        ann = parse_annotation(
            os.path.join(self.root, "Annotations", f"{image_id}.xml"),
            keep_difficult=True,
        )
        keep = (~ann["difficult"] if self.skip_difficult
                else np.ones(len(ann["labels"]), bool))
        return {
            "image": self._load_image(image_id),
            "boxes": ann["boxes"][keep],
            "labels": ann["labels"][keep],
            "difficult": ann["difficult"][keep],
            "id": image_id,
        }

    def __iter__(self) -> Iterator[Dict]:
        for i in range(len(self.ids)):
            yield self.example(i)


def get_custom_imgs(path: str) -> List[str]:
    """Mirror of reference data_utils.get_custom_imgs — image files in a
    folder, for arbitrary-image prediction."""
    exts = {".jpg", ".jpeg", ".png", ".bmp"}
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if os.path.splitext(f)[1].lower() in exts
    )


def custom_image_generator(paths: Sequence[str],
                           image_size: int) -> Iterator[Dict]:
    """Mirror of reference data_utils.custom_data_generator."""
    from PIL import Image

    for p in paths:
        img = Image.open(p).convert("RGB")
        orig_w, orig_h = img.size
        arr = np.asarray(
            img.resize((image_size, image_size), Image.BILINEAR), np.uint8)
        yield {
            "image": arr,
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int32),
            "difficult": np.zeros((0,), bool),
            "id": os.path.basename(p),
            "orig_hw": (orig_h, orig_w),
        }
