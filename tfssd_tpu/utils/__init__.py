"""Utility layer: checkpointing, metrics/logging, drawing, CLI glue.

Reference parity map:
  Keras ModelCheckpoint / load_weights -> tfssd_tpu.utils.checkpoint (orbax)
  TensorBoard callback                 -> tfssd_tpu.utils.metrics (JSONL/CSV)
  utils/drawing_utils.py               -> tfssd_tpu.utils.drawing
  utils/io_utils.py                    -> tfssd_tpu.utils.io
"""
