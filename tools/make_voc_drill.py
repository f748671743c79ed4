"""Render a learnable VOC-format dataset to disk (VERDICT r4 next #6).

The r4 fixture test proved the raw-VOCdevkit plumbing on a 3-image tree;
this generates a ~real-scale VOCdevkit directory — JPEG images, VOC XML
annotations with pixel-coordinate bndboxes and class names, and
ImageSets/Main split lists — from the deterministic SyntheticDataset
scenes, so trainer.py -> predictor.py -> mAP can be driven through the
FULL on-disk path (JPEG decode workers, XML parsing, padding, shuffle,
difficult handling) at a scale where batching/cadence bugs can manifest.

Scenes are the same distribution every recorded mAP in ARCHITECTURE.md
uses (class == rectangle color bin), so the resulting mAP is comparable
with the synthetic-trained checkpoints. JPEG compression adds realistic
pixel noise on top.

Usage:
    python tools/make_voc_drill.py --out /tmp/voc_drill \
        [--train 192] [--test 64] [--image-size 300] [--difficult-every 17]
Then:
    python trainer.py --dataset voc --data-root /tmp/voc_drill/VOC2007 ...
    python predictor.py --dataset voc --data-root /tmp/voc_drill/VOC2007 \
        --split test ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfssd_tpu.data import SyntheticDataset, get_labels


def write_split(root: str, split: str, num: int, image_size: int,
                seed: int, difficult_every: int) -> None:
    from PIL import Image

    labels = get_labels()
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    ds = SyntheticDataset(num, image_size=image_size, seed=seed)
    ids = []
    obj_count = 0
    for i in range(num):
        ex = ds.example(i)
        image_id = f"{split}_{i:06d}"
        ids.append(image_id)
        Image.fromarray(ex["image"]).save(
            os.path.join(root, "JPEGImages", f"{image_id}.jpg"),
            quality=92)
        objs = []
        for j, (box, lab) in enumerate(zip(ex["boxes"], ex["labels"])):
            y0, x0, y1, x1 = (float(v) for v in box)
            # VOC bndbox is 1-based inclusive pixel coords. round(), not
            # int(): the stored floats are px/size, and truncation
            # re-applies the binary rounding error downward (~4% of
            # coords came back 1 px short — r5 review; the recorded
            # r5 drill run predates this fix, a 1-px GT jitter).
            name = labels[int(lab)]
            obj_count += 1
            diff = 1 if (difficult_every
                         and obj_count % difficult_every == 0) else 0
            objs.append(f"""  <object><name>{name}</name>
    <pose>Unspecified</pose><truncated>0</truncated>
    <difficult>{diff}</difficult>
    <bndbox><xmin>{round(x0 * image_size) + 1}</xmin>
      <ymin>{round(y0 * image_size) + 1}</ymin>
      <xmax>{round(x1 * image_size)}</xmax>
      <ymax>{round(y1 * image_size)}</ymax></bndbox>
  </object>""")
        xml = (f"<annotation>\n  <filename>{image_id}.jpg</filename>\n"
               f"  <size><width>{image_size}</width>"
               f"<height>{image_size}</height><depth>3</depth></size>\n"
               + "\n".join(objs) + "\n</annotation>\n")
        with open(os.path.join(root, "Annotations", f"{image_id}.xml"),
                  "w") as f:
            f.write(xml)
    with open(os.path.join(root, "ImageSets", "Main", f"{split}.txt"),
              "w") as f:
        f.write("\n".join(ids) + "\n")
    print(f"{split}: {num} images, {obj_count} objects -> {root}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=192)
    p.add_argument("--test", type=int, default=64)
    p.add_argument("--image-size", type=int, default=300)
    p.add_argument("--difficult-every", type=int, default=17,
                   help="mark every Nth object difficult (0 = none) so "
                        "the difficult-ignore eval path is exercised")
    args = p.parse_args()
    root = os.path.join(args.out, "VOC2007")
    write_split(root, "trainval", args.train, args.image_size,
                seed=424200, difficult_every=args.difficult_every)
    write_split(root, "test", args.test, args.image_size,
                seed=535300, difficult_every=args.difficult_every)


if __name__ == "__main__":
    main()
