from grounded_video_description_tpu.ops.pallas.region_attention import (  # noqa: F401
    fused_region_attention,
)
