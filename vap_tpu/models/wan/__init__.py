from .config import WanMOTConfig
from .transformer_mot import init_wan_mot, wan_mot_forward
from .weights import convert_wan_mot_state_dict
