from .config import LTXVideoConfig
from .transformer import (
    convert_ltx_video_state_dict,
    init_ltx_video,
    ltx_rope,
    ltx_video_forward,
    pack_ltx_latents,
)
