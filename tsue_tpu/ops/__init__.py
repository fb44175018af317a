from tsue_tpu.ops.attention import (dot_product_attention,
                                    get_attention_impl, set_attention_impl,
                                    resolve_attention_impl, attention_impl)
from tsue_tpu.ops.sampling import SamplingConfig, process_and_sample
from tsue_tpu.ops.flash import flash_attention
from tsue_tpu.ops.fused import (fused_rmsnorm, swiglu_matmul, fused_enabled,
                                fused_scope, set_fused)
from tsue_tpu.ops.quant import (int8_matmul, quantize_weight,
                                quantize_llama_params,
                                with_quantized_decode)
from tsue_tpu.ops.nlinear import nlinear_fused, nlinear_ref
from tsue_tpu.ops.lora import lora_matmul, lora_ref
from tsue_tpu.ops.metric_kernels import fused_ade_fde
