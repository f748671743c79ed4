"""tfssd_tpu — a TPU-native single-shot (SSD) object detection framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the reference
TF2 implementation (FurkanOM/tf-ssd): SSD300/SSD512 detectors with
MobileNetV2 and VGG16 (atrous fc6/fc7) backbones, fixed-grid prior boxes,
in-jit IoU matching + target encoding, smooth-L1 + hard-negative-mining
confidence loss, fused decode + per-class NMS, a batch-vectorized VOC input
pipeline, data-parallel training over a `jax.sharding.Mesh`, orbax
checkpointing and VOC mAP@0.5 evaluation.

Reference parity map (reference is pure-Python TF2; see SURVEY.md):
  utils/bbox_utils.py      -> tfssd_tpu.ops.boxes
  utils/train_utils.py     -> tfssd_tpu.config, tfssd_tpu.ops.matching,
                              tfssd_tpu.train
  ssd_loss.py              -> tfssd_tpu.ops.losses
  models/ssd_vgg16.py      -> tfssd_tpu.models.vgg16
  models/ssd_mobilenet_v2.py -> tfssd_tpu.models.mobilenet_v2
  models/header.py         -> tfssd_tpu.models.head
  models/decoder.py        -> tfssd_tpu.models.decoder (+ ops.nms)
  utils/data_utils.py      -> tfssd_tpu.data.voc, tfssd_tpu.data.loader
  utils/augmentation.py    -> tfssd_tpu.data.augment
  utils/eval_utils.py      -> tfssd_tpu.evaluate
  utils/drawing_utils.py   -> tfssd_tpu.utils.drawing
  utils/io_utils.py        -> tfssd_tpu.utils.io
  trainer.py / predictor.py -> trainer.py / predictor.py (repo root)
"""

__version__ = "0.1.0"

from tfssd_tpu.config import SSDConfig, get_hyper_params  # noqa: F401
