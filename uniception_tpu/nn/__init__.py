from uniception_tpu.nn.blocks import (
    Attention,
    CrossAttention,
    CrossAttentionBlock,
    DiffAttention,
    DiffCrossAttention,
    DiffCrossAttentionBlock,
    DiffSelfAttentionBlock,
    DropPath,
    LayerScale,
    Mlp,
    RMSNorm,
    SelfAttentionBlock,
    SwiGLUFFN,
    SwiGLUFFNFused,
    lambda_init_fn,
    layer_norm_factory,
    make_norm_layer,
)
from uniception_tpu.nn.common import Identity, LinearX, gelu_exact, trunc_normal, xavier_uniform
from uniception_tpu.nn.gptq import apply_gptq, gptq_int8, harvest_hessians, install_hessian_capture, load_gptq_npz
from uniception_tpu.nn.lora import LoRALinear, apply_lora, lora_trainable, merge_lora
from uniception_tpu.nn.quant import Int8Linear, quantize_int8, quantize_linears
from uniception_tpu.nn.scan import make_stacked_blocks, scan_blocks, stacked_state_from_list, unstack_block
