from .config import WanMOTConfig
from .transformer_mot import (
    expand_patch_embedding,
    init_wan,
    init_wan_mot,
    wan_forward,
    wan_mot_forward,
)
from .weights import convert_wan_mot_state_dict, convert_wan_state_dict
