"""T5/UMT5 encoder parity vs HF transformers torch models (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.text_encoders import T5Config, convert_t5_state_dict, t5_encode


def _hf_cfg(torch, cfg: T5Config, umt5: bool):
    if umt5:
        from transformers import UMT5Config as HFConfig
    else:
        from transformers import T5Config as HFConfig
    return HFConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv, d_ff=cfg.d_ff,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False, use_cache=False,
        tie_word_embeddings=False,
    )


@pytest.mark.parametrize("umt5", [False, True])
def test_t5_encoder_parity(torch_reference, umt5):
    torch = torch_reference
    if umt5:
        from transformers import UMT5EncoderModel as HFModel
    else:
        from transformers import T5EncoderModel as HFModel

    cfg = T5Config.tiny(per_layer_relative_bias=umt5)
    torch.manual_seed(0)
    model = HFModel(_hf_cfg(torch, cfg, umt5)).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 11))
    mask = np.ones((2, 11), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    params = convert_t5_state_dict({k: v.numpy() for k, v in model.state_dict().items()}, cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        got = t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    # only compare non-masked positions (HF zeroes differ at padded tokens upstream)
    np.testing.assert_allclose(np.asarray(got)[0], ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got)[1, :7], ref[1, :7], atol=2e-4, rtol=1e-3)
