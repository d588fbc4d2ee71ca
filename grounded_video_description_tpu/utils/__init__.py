from grounded_video_description_tpu.utils.logging import (  # noqa: F401
    MetricLogger, ProfilerHooks,
)
