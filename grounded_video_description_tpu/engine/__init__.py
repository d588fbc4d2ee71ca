from grounded_video_description_tpu.engine.trainer import (  # noqa: F401
    Trainer, TrainState, make_optimizer,
)
