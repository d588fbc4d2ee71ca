from grounded_video_description_tpu.models.gvd import GVDModel  # noqa: F401
