"""Golden parity: CLIP text encoder vs transformers CLIPTextModel (tiny, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from vap_tpu.models.text_encoders.clip_text import (
    CLIPTextConfig, clip_text_encode, convert_clip_text_state_dict, init_clip_text)


def test_clip_text_parity(torch_reference):
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    cfg = CLIPTextConfig.tiny()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu", eos_token_id=cfg.eos_token_id,
        bos_token_id=cfg.eos_token_id - 1, pad_token_id=0,
    )
    torch.manual_seed(0)
    m = CLIPTextModel(hf_cfg).eval()
    params = convert_clip_text_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size - 1, (2, cfg.max_position_embeddings)).astype(np.int32)
    ids[0, 5] = cfg.eos_token_id
    ids[1, 9] = cfg.eos_token_id

    with torch.no_grad():
        out = m(torch.from_numpy(ids.astype(np.int64)))
        ref_hidden = out.last_hidden_state.numpy()
        ref_pooled = out.pooler_output.numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        hidden, pooled = clip_text_encode(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-5, rtol=1e-4)


def test_clip_text_parity_legacy_eos_2(torch_reference):
    """Legacy hub configs (pre transformers#24773 — the openai clip-vit-*
    checkpoints) ship eos_token_id=2, which never occurs in tokenized text;
    HF pools at argmax(input_ids) (the real EOT is the vocab max). A naive
    `ids == 2` match finds nothing and silently pools position 0, which made
    every CLIP score from the standard backbone meaningless."""
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    cfg = CLIPTextConfig.tiny(eos_token_id=2)
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu", eos_token_id=2, bos_token_id=1, pad_token_id=0,
    )
    torch.manual_seed(0)
    m = CLIPTextModel(hf_cfg).eval()
    params = convert_clip_text_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(1)
    # caption tokens then the real EOT (= vocab max), then padding — token id
    # 2 never appears, exactly like real openai-CLIP tokenizations
    ids = rng.integers(3, cfg.vocab_size - 2, (2, cfg.max_position_embeddings)).astype(np.int32)
    ids[0, 6] = cfg.vocab_size - 1
    ids[0, 7:] = 0
    ids[1, 11] = cfg.vocab_size - 1
    ids[1, 12:] = 0

    with torch.no_grad():
        out = m(torch.from_numpy(ids.astype(np.int64)))
    with jax.default_device(jax.devices("cpu")[0]):
        _, pooled = clip_text_encode(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4)


def test_clip_text_init_structure():
    cfg = CLIPTextConfig.tiny()
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    hidden, pooled = clip_text_encode(
        params, cfg, jnp.zeros((1, cfg.max_position_embeddings), jnp.int32))
    assert hidden.shape == (1, cfg.max_position_embeddings, cfg.hidden_size)
    assert pooled.shape == (1, cfg.hidden_size)
