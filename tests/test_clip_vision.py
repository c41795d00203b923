"""CLIP vision encoder parity vs HF transformers (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp

from vap_tpu.models.text_encoders.clip_vision import (
    CLIPVisionConfig,
    clip_vision_encode,
    convert_clip_vision_state_dict,
)


def test_clip_vision_parity(torch_reference):
    torch = torch_reference
    from transformers import CLIPVisionConfig as HFConfig, CLIPVisionModel

    cfg = CLIPVisionConfig.tiny()
    torch.manual_seed(0)
    model = CLIPVisionModel(HFConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers, num_attention_heads=cfg.num_attention_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size, hidden_act=cfg.hidden_act,
    )).eval()

    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(px), output_hidden_states=True)
        ref_penult = ref.hidden_states[-2].numpy()

    params = convert_clip_vision_state_dict({k: v.numpy() for k, v in model.state_dict().items()}, cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        got = clip_vision_encode(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref_penult, atol=3e-4, rtol=3e-3)
