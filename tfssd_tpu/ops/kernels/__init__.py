"""Pallas (Mosaic) TPU kernels — the framework's native-code tier.

The reference has zero native code (pure TF2 Python, SURVEY.md §2); its
heavy ops are stock TF C++ kernels. Here the equivalent tier is Pallas:
hand-fused TPU kernels for the hot ops, each with a jax.numpy reference
implementation and parity tests (SURVEY.md §4 item 4), selectable via
`SSDConfig.use_pallas`.

  match_encode.py  — fused IoU + argmax matching + delta encoding
                     (training's per-step hot op; the reference computes
                     this eagerly on host per batch)
  nms_keep.py      — fused IoU + greedy-suppression (the
                     combined_non_max_suppression core), VMEM-resident
"""

from tfssd_tpu.ops.kernels.match_encode import match_batch_pallas  # noqa: F401
from tfssd_tpu.ops.kernels.nms_keep import nms_keep_pallas  # noqa: F401
