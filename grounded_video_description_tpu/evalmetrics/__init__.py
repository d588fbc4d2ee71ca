from grounded_video_description_tpu.evalmetrics.cider import compute_cider  # noqa: F401
from grounded_video_description_tpu.evalmetrics.bleu import compute_bleu  # noqa: F401
from grounded_video_description_tpu.evalmetrics.meteor import compute_meteor  # noqa: F401
from grounded_video_description_tpu.evalmetrics.densecap import DensecapEvaluator  # noqa: F401
from grounded_video_description_tpu.evalmetrics.grounding import GroundingEvaluator  # noqa: F401
