from .config import HunyuanVideoConfig
from .transformer import (
    convert_hunyuan_video_state_dict,
    hunyuan_rope,
    hunyuan_video_forward,
    init_hunyuan_video,
)
