"""Utility subpackage (ref: utils.py)."""

from learnablepoolingmethods_tpu.utils.quantization import (  # noqa: F401
    dequantize,
    dequantize_np,
    quantize_np,
)
from learnablepoolingmethods_tpu.utils.misc import (  # noqa: F401
    get_list_of_feature_names_and_sizes,
)
