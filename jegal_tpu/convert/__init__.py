from jegal_tpu.convert.torch_import import (
    linear_from_torch,
    layer_norm_from_torch,
    batch_norm_from_torch,
    conv2d_from_torch,
    conv3d_from_torch,
    mha_from_annotated_torch,
    mha_from_torch_native,
    encoder_stack_from_annotated_torch,
    torch_encoder_stack_from_torch,
)
