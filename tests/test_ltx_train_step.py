"""LTX-Video flow-matching SFT step: runs, learns, first-frame conditioning
branch jit-compiles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.ltx_video import LTXVideoConfig, init_ltx_video
from vap_tpu.training import get_lr_schedule, get_optimizer
from vap_tpu.training.specs import LTXVideoSpec, get_model_spec_cls
from vap_tpu.training.train_step import LTXTrainStepConfig, make_ltx_train_step


def test_ltx_train_step_runs_and_learns(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mcfg = LTXVideoConfig.tiny()
    cfg = LTXTrainStepConfig(model=mcfg, remat=False,
                             first_frame_conditioning_p=0.5)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_ltx_video(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_ltx_train_step(cfg, tx)
        train_p, frozen_p, opt_state = init_fn(params)
        step = jax.jit(step_fn)

        B, C, F, H, W = 2, mcfg.in_channels, 3, 2, 2
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (B, C, F, H, W)),
            "encoder_hidden_states": jax.random.normal(k, (B, 5, mcfg.caption_channels)),
            "prompt_attention_mask": jnp.ones((B, 5)),
        }
        losses = []
        for i in range(6):
            train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch,
                                               jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert min(losses[1:]) < losses[0], losses


def test_ltx_spec_registered_and_conditions():
    assert get_model_spec_cls("ltx_video", "sft") is LTXVideoSpec

    class FakeTokenizer:
        def __call__(self, texts, padding=None, max_length=8, truncation=True,
                     add_special_tokens=True, return_tensors="np"):
            ids = np.zeros((len(texts), max_length), np.int32)
            for i, t in enumerate(texts):
                for j, ch in enumerate(t[:max_length]):
                    ids[i, j] = (ord(ch) * 3 + j) % 30 + 1
            return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}

    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder

    mcfg = LTXVideoConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=mcfg.caption_channels)
    with jax.default_device(jax.devices("cpu")[0]):
        params = {"text_encoder": init_t5_encoder(jax.random.PRNGKey(0), txt_cfg, jnp.float32)}
        spec = LTXVideoSpec(mcfg, None, txt_cfg, params, FakeTokenizer(), jnp.float32)
        cond = spec.prepare_conditions({"caption": "hi"}, max_length=8)
    assert cond["encoder_hidden_states"].shape == (1, 8, mcfg.caption_channels)
    # precomputed latents pass through; raw video raises an actionable error
    lat = spec.prepare_latents({"latents": np.zeros((1, 8, 2, 2, 2), np.float32)})
    assert lat["latents"].shape == (1, 8, 2, 2, 2)
    with pytest.raises(NotImplementedError):
        spec.prepare_latents({"video": np.zeros((3, 8, 8, 3), np.float32)})
