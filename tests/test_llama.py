"""Golden parity: LLaMA text encoder vs transformers LlamaModel (tiny, CPU).
GQA + rotary + SwiGLU; padded positions compared only where valid (padded
query rows differ by design — we keep the diagonal finite to avoid NaNs)."""

import numpy as np
import jax
import jax.numpy as jnp

from vap_tpu.models.text_encoders.llama import (
    LlamaConfig, convert_llama_state_dict, init_llama, llama_encode)


def test_llama_parity(torch_reference):
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaModel

    cfg = LlamaConfig.tiny()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = LlamaModel(hf_cfg).eval()
    params = convert_llama_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    S = 12
    ids = rng.integers(1, cfg.vocab_size, (2, S)).astype(np.int32)
    mask = np.ones((2, S), np.int64)
    mask[1, 9:] = 0  # right padding

    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(llama_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))

    np.testing.assert_allclose(got[0], ref[0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(got[1, :9], ref[1, :9], atol=3e-5, rtol=1e-4)


def test_llama_init_structure():
    cfg = LlamaConfig.tiny()
    params = init_llama(jax.random.PRNGKey(0), cfg)
    out = llama_encode(params, cfg, jnp.zeros((1, 8), jnp.int32))
    assert out.shape == (1, 8, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_llama_hidden_layer_parity(torch_reference):
    """HunyuanVideo conditions on output_hidden_states[-3] (un-normed block
    output, num_hidden_layers_to_skip=2) — llama_encode(hidden_layer=-3)
    must match HF, including with right-padding masked."""
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaModel

    cfg = LlamaConfig.tiny(num_hidden_layers=3)
    torch.manual_seed(4)
    m = LlamaModel(HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta, attention_bias=False, pad_token_id=0)).eval()
    params = convert_llama_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        hs = m(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
               output_hidden_states=True).hidden_states
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(llama_encode(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask), hidden_layer=-3))
    ref = hs[-3].numpy()
    np.testing.assert_allclose(got[0], ref[0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(got[1, :9], ref[1, :9], atol=3e-5, rtol=1e-4)
