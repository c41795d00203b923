from .config import FluxConfig
from .transformer import (
    convert_flux_state_dict,
    flux_forward,
    init_flux,
    pack_latents,
    prepare_latent_image_ids,
    unpack_latents,
)
