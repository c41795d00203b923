from .video import (
    export_to_video,
    get_resample_indices,
    load_video,
    normalize_video,
    resize_frame,
    resize_to_nearest_bucket,
)
