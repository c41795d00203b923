from .aesthetic import (  # noqa: F401
    aesthetic_head,
    convert_aesthetic_state_dict,
    init_aesthetic,
    video_aesthetic_score,
)
from .flow_metrics import (  # noqa: F401
    FlowMetrics,
    dynamic_degree_set,
)
from .suite import VideoMetricsSuite  # noqa: F401
from .clip_score import (  # noqa: F401
    METRIC_REFERENCES,
    CLIPScoreConfig,
    CLIPScorer,
    clip_image_embed,
    clip_score,
    clip_text_embed,
    convert_clip_model_state_dict,
    init_clip_score,
    preprocess_frames,
    video_clip_score,
)
