from .t5 import T5Config, convert_t5_state_dict, init_t5_encoder, t5_encode
