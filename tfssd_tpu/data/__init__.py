"""Data layer: VOC parsing, synthetic scenes, batching, augmentation.

Reference parity map:
  utils/data_utils.py   -> tfssd_tpu.data.voc (+ loader)
  utils/augmentation.py -> tfssd_tpu.data.augment (in-jit, batched)
"""

from tfssd_tpu.data.augment import augment_batch, augment_image  # noqa: F401
from tfssd_tpu.data.loader import (  # noqa: F401
    ConcatDataset,
    TakeDataset,
    batch_examples,
    pad_gt,
    prefetch,
    stack_batches,
    stage_arrays,
)
from tfssd_tpu.data.synthetic import SyntheticDataset  # noqa: F401
from tfssd_tpu.data.voc import (  # noqa: F401
    LABELS,
    VOC_CLASSES,
    VOCDataset,
    custom_image_generator,
    get_custom_imgs,
    get_labels,
    parse_annotation,
)
