"""LoRA adapters and the DPO training step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.training import TrainStepConfig, get_lr_schedule, get_optimizer
from vap_tpu.training.lora import apply_lora, init_lora, lora_param_count
from vap_tpu.training.train_step import make_dpo_step


def test_lora_targets_mot_only():
    cfg = CogVideoXMOTConfig.tiny()
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4, mot_only=True)
    n = lora_param_count(lora)
    assert n > 0
    # adapters exist only under *_mot_ref branches
    seg = lora["blocks"][0]
    assert seg["attn1_mot_ref"]["to_q"]["kernel"] is not None
    assert seg["attn1"]["to_q"]["kernel"] is None
    assert seg["attn1_mot_ref"]["to_q"]["kernel"]["A"].shape[-1] == 4

    # zero-initialized B => apply_lora is identity at init
    merged = apply_lora(params, lora, alpha=8, rank=4)
    np.testing.assert_allclose(
        np.asarray(merged["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"]),
        np.asarray(params["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"]))

    # non-zero B changes only targeted kernels
    lora2 = jax.tree.map(lambda x: x + 0.1, lora)
    merged2 = apply_lora(params, lora2, alpha=8, rank=4)
    changed = np.abs(np.asarray(merged2["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"])
                     - np.asarray(params["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"])).max()
    unchanged = np.abs(np.asarray(merged2["blocks"][0]["attn1"]["to_q"]["kernel"])
                       - np.asarray(params["blocks"][0]["attn1"]["to_q"]["kernel"])).max()
    assert changed > 0 and unchanged == 0


def test_lora_export_peft_layout(tmp_path):
    from vap_tpu.training.checkpoint import (
        export_lora_safetensors, load_lora_metadata, load_safetensors)

    cfg = CogVideoXMOTConfig.tiny()
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4, mot_only=True)
    path = export_lora_safetensors(
        lora, cfg, str(tmp_path / "lora.safetensors"), rank=4, alpha=8.0)

    sd = load_safetensors(path)
    assert sd, "no adapter tensors exported"
    a_key = "transformer.transformer_blocks.0.attn1_mot_ref.to_q.lora_A.weight"
    assert a_key in sd
    assert sd[a_key].shape[0] == 4  # [r, in]
    b_key = a_key.replace("lora_A", "lora_B")
    assert sd[b_key].shape[1] == 4  # [out, r]
    np.testing.assert_array_equal(sd[b_key], 0.0)  # B zero-init
    # all adapters target MoT branches only
    assert all("_mot_ref" in k for k in sd)
    # every block with MoT carries adapters for attention + FFN
    assert "transformer.transformer_blocks.0.ff_mot_ref.net.0.proj.lora_A.weight" in sd
    assert "transformer.transformer_blocks.0.attn1_mot_ref.to_out.0.lora_A.weight" in sd

    meta = load_lora_metadata(path)
    assert meta["r"] == 4 and meta["lora_alpha"] == 8.0
    assert "to_q" in meta["target_modules"]
    assert "net.0.proj" in meta["target_modules"]


def test_dpo_step_runs_and_updates(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2)
    cfg = TrainStepConfig(model=mcfg, remat=False)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_cogvideox_mot(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_dpo_step(cfg, tx, lora_rank=2, lora_alpha=2.0)
        lora, opt_state = init_fn(params, jax.random.PRNGKey(1))

        B, F, C, H, W = 2, 2, 2, 4, 4  # 2B rows: win + lose
        T = mcfg.max_text_seq_length
        k = jax.random.PRNGKey(2)
        batch = {
            "latents": jax.random.normal(k, (2 * B, F, C, H, W)),
            "image_latents": jax.random.normal(k, (2 * B, F, C, H, W)),
            "latents_mot_ref": jax.random.normal(k, (2 * B, F, C, H, W)),
            "image_latents_mot_ref": jax.random.normal(k, (2 * B, F, C, H, W)),
            "encoder_hidden_states": jax.random.normal(k, (2 * B, T, mcfg.text_embed_dim)),
            "encoder_hidden_states_mot_ref": jax.random.normal(k, (2 * B, T, mcfg.text_embed_dim)),
            "dpo_weight": jnp.ones((B,)),
        }
        step = jax.jit(step_fn)
        lora0 = [np.asarray(x).copy() for x in jax.tree.leaves(lora)]
        lora, opt_state, metrics = step(lora, params, opt_state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0
        # at least one adapter leaf moved (A factors have zero grad at init
        # since B starts at zero; the B factors must move)
        moved = any(
            not np.allclose(np.asarray(after), before)
            for after, before in zip(jax.tree.leaves(lora), lora0)
        )
        assert moved


def test_lora_export_flux_layout(tmp_path):
    """PEFT export generalizes to non-MoT families (Flux dual/single blocks)."""
    from vap_tpu.models.flux import FluxConfig, init_flux
    from vap_tpu.training.checkpoint import export_lora_safetensors, load_safetensors

    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=2, mot_only=False)
    path = export_lora_safetensors(
        lora, cfg, str(tmp_path / "flux_lora.safetensors"), rank=2, alpha=4.0)
    sd = load_safetensors(path)
    assert "transformer.transformer_blocks.0.attn.to_q.lora_A.weight" in sd
    assert "transformer.single_transformer_blocks.1.attn.to_q.lora_B.weight" in sd
    assert sd["transformer.transformer_blocks.0.attn.to_q.lora_A.weight"].shape[0] == 2


def test_merge_lora_into_state_dict_roundtrip(tmp_path):
    """Inference-time LoRA fusion: export adapters (PEFT layout), fuse them
    into the HF-layout state dict, convert back — equals apply_lora on the
    JAX params. This is the path behind --lora_path on the inference CLI."""
    from vap_tpu.models.cogvideox import convert_cogvideox_mot_state_dict
    from vap_tpu.training.checkpoint import (
        _flatten_to_reference_names, export_lora_safetensors,
        merge_lora_into_state_dict)

    cfg = CogVideoXMOTConfig.tiny()
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4, mot_only=True)
    # non-zero B so the fusion actually changes weights
    lora = jax.tree.map(lambda x: x + 0.05, lora)

    path = export_lora_safetensors(
        lora, cfg, str(tmp_path / "lora.safetensors"), rank=4, alpha=8.0)
    sd = _flatten_to_reference_names(params, cfg)
    merged_sd = merge_lora_into_state_dict(sd, path)  # scale = alpha/r = 2.0
    back = convert_cogvideox_mot_state_dict(merged_sd, cfg, jnp.float32)
    expect = apply_lora(params, lora, alpha=8.0, rank=4)

    got_k = np.asarray(back["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"])
    exp_k = np.asarray(expect["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"])
    assert np.abs(exp_k - np.asarray(
        params["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"])).max() > 1e-4
    np.testing.assert_allclose(got_k, exp_k, atol=1e-5)
    # untargeted kernels unchanged
    np.testing.assert_allclose(
        np.asarray(back["blocks"][0]["attn1"]["to_q"]["kernel"]),
        np.asarray(params["blocks"][0]["attn1"]["to_q"]["kernel"]), atol=1e-6)
    # explicit scale override
    merged_half = merge_lora_into_state_dict(sd, path, scale=1.0)
    back_half = convert_cogvideox_mot_state_dict(merged_half, cfg, jnp.float32)
    half_k = np.asarray(back_half["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"])
    base_k = np.asarray(params["blocks"][0]["attn1_mot_ref"]["to_q"]["kernel"])
    np.testing.assert_allclose(half_k - base_k, (got_k - base_k) / 2.0,
                               atol=1e-5, rtol=1e-4)


def test_merge_lora_into_state_dict_errors(tmp_path):
    from safetensors.numpy import save_file

    from vap_tpu.training.checkpoint import merge_lora_into_state_dict

    empty = str(tmp_path / "empty.safetensors")
    save_file({"x.weight": np.zeros((2, 2), np.float32)}, empty)
    with pytest.raises(ValueError, match="no .*lora_A"):
        merge_lora_into_state_dict({"x.weight": np.zeros((2, 2))}, empty)

    bad = str(tmp_path / "bad.safetensors")
    save_file({"transformer.missing.lora_A.weight": np.zeros((2, 3), np.float32),
               "transformer.missing.lora_B.weight": np.zeros((3, 2), np.float32)},
              bad)
    with pytest.raises(KeyError, match="missing.weight"):
        merge_lora_into_state_dict({"x.weight": np.zeros((2, 2))}, bad)
