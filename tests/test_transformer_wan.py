"""Golden-value parity: JAX Wan MOT transformer vs reference torch model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.wan import WanMOTConfig, convert_wan_mot_state_dict, wan_mot_forward
from vap_tpu.ops.attention import attention_provider


def _make_reference(torch, cfg: WanMOTConfig):
    from diffusers.models.transformers.transformer_wan_mot import WanTransformer3DMOTModel

    torch.manual_seed(0)
    return WanTransformer3DMOTModel(
        patch_size=list(cfg.patch_size),
        num_attention_heads=cfg.num_attention_heads,
        attention_head_dim=cfg.attention_head_dim,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        text_dim=cfg.text_dim,
        freq_dim=cfg.freq_dim,
        ffn_dim=cfg.ffn_dim,
        num_layers=cfg.num_layers,
        cross_attn_norm=cfg.cross_attn_norm,
        image_dim=cfg.image_dim,
        added_kv_proj_dim=cfg.added_kv_proj_dim,
        rope_max_seq_len=cfg.rope_max_seq_len,
        block_idx_with_mot_ref=list(cfg.block_idx_with_mot_ref),
        reference_train_mode=cfg.reference_train_mode,
    ).eval()


@pytest.mark.parametrize("mot_blocks", [(0, 1), (0,)])
def test_wan_forward_parity(torch_reference, mot_blocks):
    torch = torch_reference
    cfg = WanMOTConfig.tiny(block_idx_with_mot_ref=mot_blocks)
    model = _make_reference(torch, cfg)

    # WanAttnProcessor2_0 hardcodes a 512-token text context; monkeypatch the
    # tiny text_len by padding contexts to 512 is overkill — instead the tiny
    # config uses text_len=7 and we bypass the hardcoded split by passing the
    # image context explicitly sized.
    B, F, C, H, W = 1, 2, cfg.in_channels, 8, 8
    R = 1
    rng = np.random.default_rng(0)
    hs = rng.standard_normal((B, C, F, H, W), np.float32)
    hs_ref = rng.standard_normal((B, C, R * F, H, W), np.float32)
    text = rng.standard_normal((B, 512, cfg.text_dim), np.float32)
    text_ref = rng.standard_normal((B, R * 512, cfg.text_dim), np.float32)
    img = rng.standard_normal((B, 257, cfg.image_dim), np.float32)
    img_ref = rng.standard_normal((B, R * 257, cfg.image_dim), np.float32)
    t = np.array([500.0], np.float32)
    t_ref = np.array([1.0], np.float32)

    with torch.no_grad():
        ref_out = model(
            hidden_states=torch.from_numpy(hs),
            timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(text),
            encoder_hidden_states_image=torch.from_numpy(img),
            return_dict=False,
            num_mot_ref=R,
            hidden_states_mot_ref=torch.from_numpy(hs_ref),
            timestep_list_mot_ref=[torch.from_numpy(t_ref)],
            encoder_hidden_states_mot_ref=torch.from_numpy(text_ref),
            encoder_hidden_states_image_mot_ref=torch.from_numpy(img_ref),
        )[0].numpy()

    cfg512 = WanMOTConfig.tiny(block_idx_with_mot_ref=mot_blocks, text_len=512)
    params = convert_wan_mot_state_dict(
        {k: v.float().numpy() for k, v in model.state_dict().items()}, cfg512)

    to_cl = lambda x: jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # BCFHW -> BFHWC
    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        got, got_ref = wan_mot_forward(
            params, cfg512,
            hidden_states=to_cl(hs),
            timestep=jnp.asarray(t),
            encoder_hidden_states=jnp.asarray(text),
            encoder_hidden_states_image=jnp.asarray(img),
            hidden_states_mot_ref=to_cl(hs_ref),
            timestep_mot_ref=jnp.asarray(t_ref)[None],
            encoder_hidden_states_mot_ref=jnp.asarray(text_ref),
            encoder_hidden_states_image_mot_ref=jnp.asarray(img_ref),
            num_mot_ref=R,
        )
    got_t = np.asarray(got).transpose(0, 4, 1, 2, 3)  # BFHWC -> BCFHW
    assert got_ref is None
    np.testing.assert_allclose(got_t, ref_out, atol=3e-4, rtol=3e-3)
