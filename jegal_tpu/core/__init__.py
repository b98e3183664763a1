from jegal_tpu.core.layers import (
    linear,
    mlp,
    ref_layer_norm,
    std_layer_norm,
    batch_norm_inference,
    conv2d,
    conv3d,
    max_pool2d,
    max_pool3d,
)
from jegal_tpu.core.transformer import (
    sinusoidal_position_encoding,
    multi_head_attention,
    encoder_stack,
    torch_encoder_stack,
)
