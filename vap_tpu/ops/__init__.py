from .attention import (
    attention_provider,
    dense_attention,
    get_attention_provider,
    scaled_dot_product_attention,
)
from .flash_attention import flash_attention
from .rope import (
    apply_rotary_emb,
    get_1d_rotary_pos_embed,
    get_3d_rotary_pos_embed,
    get_resize_crop_region_for_grid,
    prepare_cogvideox_rotary_embeddings,
)
