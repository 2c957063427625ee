from text_to_image_tpu.ops.pallas.fused import (  # noqa: F401
    bn_act,
    conditioning_join,
    pallas_enabled,
    use_pallas,
)
