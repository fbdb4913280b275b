from whisperx_tpu.ops.flash_attention import flash_attention
from whisperx_tpu.ops.quant_matmul import quant_matmul

__all__ = ["flash_attention", "quant_matmul"]
