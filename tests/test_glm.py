"""Golden parity: GLM-4 text encoder vs transformers GlmModel (tiny, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from vap_tpu.models.text_encoders.glm import (
    GlmConfig, convert_glm_state_dict, glm_encode, init_glm)


def test_glm_parity(torch_reference):
    import torch
    from transformers import GlmConfig as HFConfig, GlmModel

    cfg = GlmConfig.tiny()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, partial_rotary_factor=cfg.partial_rotary_factor,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        pad_token_id=0, attention_bias=True,
    )
    torch.manual_seed(0)
    m = GlmModel(hf_cfg).eval()
    params = convert_glm_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    S = 10
    ids = rng.integers(1, cfg.vocab_size, (2, S)).astype(np.int32)
    mask = np.ones((2, S), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(glm_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))

    np.testing.assert_allclose(got[0], ref[0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(got[1, :7], ref[1, :7], atol=3e-5, rtol=1e-4)


def test_glm_init_runs():
    cfg = GlmConfig.tiny()
    params = init_glm(jax.random.PRNGKey(0), cfg)
    out = glm_encode(params, cfg, jnp.zeros((1, 6), jnp.int32))
    assert out.shape == (1, 6, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_glm_penultimate_hidden_layer_parity(torch_reference):
    """CogView4 conditions on output_hidden_states[-2] (un-normed penultimate
    block), not last_hidden_state — glm_encode(hidden_layer=-2) must match."""
    import torch
    from transformers import GlmConfig as HFConfig, GlmModel

    cfg = GlmConfig.tiny(num_hidden_layers=3)
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, partial_rotary_factor=cfg.partial_rotary_factor,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        pad_token_id=0, attention_bias=True,
    )
    torch.manual_seed(1)
    m = GlmModel(hf_cfg).eval()
    params = convert_glm_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, cfg.vocab_size, (1, 16)).astype(np.int32)
    with torch.no_grad():
        hs = m(torch.from_numpy(ids.astype(np.int64)),
               output_hidden_states=True).hidden_states
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(glm_encode(params, cfg, jnp.asarray(ids), hidden_layer=-2))
    np.testing.assert_allclose(got, hs[-2].numpy(), atol=3e-5, rtol=1e-4)
