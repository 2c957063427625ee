from text_to_image_tpu.ops.pallas.conv import (  # noqa: F401
    conv5x5_s2_act,
    deconv5x5_s2,
    upconv3x3,
    upconv3x3_bias,
)
from text_to_image_tpu.ops.pallas.fused import (  # noqa: F401
    bn_act,
    conditioning_join,
    pallas_enabled,
    set_default,
    use_deconv,
    use_join,
    use_pallas,
)
