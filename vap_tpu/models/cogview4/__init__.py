from .config import CogView4Config
from .transformer import (
    cogview4_forward,
    cogview4_rope,
    convert_cogview4_state_dict,
    init_cogview4,
)
