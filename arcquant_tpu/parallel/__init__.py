"""Parallelism: device meshes, tensor-parallel sharded quantized
forward (shard_map + Pallas kernels), sequence-parallel ring
attention, and multi-host init helpers."""

from .mesh import make_mesh, tp_axis
from .tp import (shard_layer_params_tp, shard_model_params_tp,
                 tp_quant_layer_forward, tp_quant_model_forward,
                 TPContext)
from .ring import ring_attention, sp_flash_prefill
from .pp import stack_stage_params, pp_quant_model_forward
from .ep import shard_moe_params, make_ep_moe_forward, ep_moe_block
