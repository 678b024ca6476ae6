"""Quantization numerics, ARC ops, and packed storage formats."""

from . import numerics, arc, packing
from .numerics import (
    nvfp4_qdq, mxfp4_qdq, mxfp6_qdq, int4_group_qdq, asym_int_group_qdq,
    quantize_tensor_qdq, group_qdq, nvfp4_global_scale,
    e2m1_encode, e2m1_decode, quantize_e2m1, quantize_ue4m3, quantize_ue8m0,
)
from .arc import (
    arc_quantize_x_qdq, arc_quantize_w_qdq, arc_linear_fake, average_bits,
)
from .packing import (
    PackedWeight, PackedWeightI8, pack_weight_arc, dequantize_weight,
    pack_nibbles, unpack_nibbles, quantize_nvfp4_groups,
    dequantize_nvfp4_groups, pad_kq, codes_to_mag2_i8,
)
