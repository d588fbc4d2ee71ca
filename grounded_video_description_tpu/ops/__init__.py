from grounded_video_description_tpu.ops.geometry import (  # noqa: F401
    bbox_overlaps_batch,
    bbox_overlaps,
    sim_mat_target,
    bbox_target,
)
from grounded_video_description_tpu.ops.attention import (  # noqa: F401
    temporal_attention,
    region_attention,
    grounder,
    MIN_VALUE,
)
