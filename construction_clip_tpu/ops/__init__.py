from construction_clip_tpu.ops.activations import quick_gelu, gelu_new, gelu_gated
from construction_clip_tpu.ops.norms import layer_norm, rms_norm
from construction_clip_tpu.ops.attention import mha, causal_mask, make_attention_bias
