"""Model graph layer: backbones, multibox heads, decoder.

Reference parity map:
  models/ssd_vgg16.py        -> tfssd_tpu.models.vgg16
  models/ssd_mobilenet_v2.py -> tfssd_tpu.models.mobilenet_v2
  models/header.py           -> tfssd_tpu.models.head
  models/decoder.py          -> tfssd_tpu.models.decoder
"""

from tfssd_tpu.models.decoder import decode_predictions, make_predict_fn  # noqa: F401
from tfssd_tpu.models.ssd import SSD, get_model, init_model  # noqa: F401
