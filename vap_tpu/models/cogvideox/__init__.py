from .config import CogVideoXMOTConfig
from .transformer_mot import cogvideox_mot_forward, init_cogvideox_mot
from .weights import convert_cogvideox_mot_state_dict
