from uniception_tpu.ops.attention import scaled_dot_product_attention
from uniception_tpu.ops.rope import Rope2D, rope_2d, rope_2d_pallas
