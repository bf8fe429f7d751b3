"""Serving-path extensions: post-training int8 quantization.

The reference has no serving story beyond eval-mode forward (test.py /
inference.py); this package adds the TPU-native one.  See quant.py.
"""

from .quant import (QuantConfig, QuantContext, calibrate_segmentor,
                    current_quant, quant_scope, resolve_mode,
                    supports_int8_conv)

__all__ = [
    "QuantConfig", "QuantContext", "calibrate_segmentor", "current_quant",
    "quant_scope", "resolve_mode", "supports_int8_conv",
]
