from tsue_tpu.ops.attention import (dot_product_attention,
                                    get_attention_impl, set_attention_impl,
                                    attention_impl)
from tsue_tpu.ops.sampling import SamplingConfig, process_and_sample
