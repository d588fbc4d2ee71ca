from grounded_video_description_tpu.data.synthetic import synthetic_batch  # noqa: F401
