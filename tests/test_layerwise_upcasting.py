"""Layerwise upcasting: float8 storage for the frozen LoRA base (reference
finetrainers/args.py:406-409 + sft_trainer/trainer.py:184-190 via diffusers'
apply_layerwise_casting; TPU analog in vap_tpu/training/layerwise.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.training.args import TrainingArgs
from vap_tpu.training.layerwise import (
    DEFAULT_SKIP_PATTERNS,
    cast_layerwise_storage,
)
from vap_tpu.training.optimizer import get_lr_schedule, get_optimizer
from vap_tpu.training.train_step import (
    TrainStepConfig,
    cogvideox_vap_loss,
    make_lora_sft_step,
    parse_target_modules,
)


def _params(mcfg, dtype=jnp.bfloat16):
    p = init_cogvideox_mot(jax.random.PRNGKey(0), mcfg)
    return jax.tree.map(lambda x: x.astype(dtype), p)


def test_cast_respects_skip_patterns():
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2)
    params = _params(mcfg)
    cast = cast_layerwise_storage(params, "float8_e4m3fn")

    blk = cast["blocks"][0]
    # projection/FFN kernels are cast (both branches)
    assert blk["attn1"]["to_q"]["kernel"].dtype == jnp.float8_e4m3fn
    assert blk["attn1_mot_ref"]["to_v"]["kernel"].dtype == jnp.float8_e4m3fn
    assert blk["ff"]["net_0"]["kernel"].dtype == jnp.float8_e4m3fn
    # skip patterns hold: embeddings, norms, final projection, time embedding
    flat = jax.tree_util.tree_flatten_with_path(cast)[0]
    for path, leaf in flat:
        names = [str(getattr(k, "key", k)) for k in path]
        if any("norm" in n or "patch_embed" in n or "time_embed" in n
               or n == "proj_out" for n in names):
            assert leaf.dtype != jnp.float8_e4m3fn, names
    # every cast leaf is exactly half its bf16 size (at real scale the tree is
    # projection-kernel-dominated, so the resident tree roughly halves; the
    # tiny test config is norm/embedding-heavy so only totals shrink here)
    assert blk["attn1"]["to_q"]["kernel"].nbytes * 2 == \
        params["blocks"][0]["attn1"]["to_q"]["kernel"].nbytes
    before = sum(x.nbytes for x in jax.tree.leaves(params))
    after = sum(x.nbytes for x in jax.tree.leaves(cast))
    assert after < before, (after, before)


def test_lora_step_on_float8_base_trains():
    """The LoRA step runs on an fp8-stored base, upcasts to the original
    compute dtype inside the step, and reaches a loss close to the full-bf16
    run (fp8 weight quantization is the only difference)."""
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2,
                                   block_idx_with_mot_ref=())
    cfg = TrainStepConfig(model=mcfg, remat=False, ablation_single_branch=True)
    tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
    init_fn, _, _, step_fn = make_lora_sft_step(
        cogvideox_vap_loss, cfg, tx, rank=2, alpha=2.0,
        targets=parse_target_modules("to_q|to_k|to_v|to_out.0"))

    B, F, C, H, W = 1, 2, 2, 4, 4
    key = jax.random.PRNGKey(2)
    batch = {
        "latents": jax.random.normal(key, (B, F, C, H, W)),
        "image_latents": jax.random.normal(jax.random.fold_in(key, 1), (B, F, C, H, W)),
        "latents_mot_ref": jax.random.normal(jax.random.fold_in(key, 2), (B, F, C, H, W)),
        "image_latents_mot_ref": jax.random.normal(jax.random.fold_in(key, 3), (B, F, C, H, W)),
        "encoder_hidden_states": jax.random.normal(
            jax.random.fold_in(key, 4), (B, mcfg.max_text_seq_length, mcfg.text_embed_dim)),
        "encoder_hidden_states_mot_ref": jax.random.normal(
            jax.random.fold_in(key, 5), (B, mcfg.max_text_seq_length, mcfg.text_embed_dim)),
    }

    params = _params(mcfg)
    step = jax.jit(step_fn)

    lora, base, opt = init_fn(params, jax.random.PRNGKey(1))
    _, _, m_bf16 = step(lora, base, opt, batch, jax.random.PRNGKey(7))

    base_f8 = cast_layerwise_storage(params, "float8_e4m3fn")
    lora, _, opt = init_fn(params, jax.random.PRNGKey(1))
    losses = []
    for _ in range(3):
        lora, opt, m = step(lora, base_f8, opt, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    # same batch/seed: the fp8 loss differs only by weight quantization noise
    assert abs(losses[0] - float(m_bf16["loss"])) < 0.15 * (1 + abs(float(m_bf16["loss"])))
    # adapters receive gradient through the upcast base
    assert float(m["grad_norm"]) > 0


def test_args_validation():
    args = TrainingArgs(layerwise_upcasting_modules="transformer",
                        pretrained_model_name_or_path="x")
    args.validate()
    with pytest.raises(ValueError, match="layerwise_upcasting module"):
        TrainingArgs(layerwise_upcasting_modules="vae").validate()
    with pytest.raises(ValueError, match="storage_dtype"):
        TrainingArgs(layerwise_upcasting_storage_dtype="int4").validate()


def test_default_skip_patterns_match_reference():
    # reference finetrainers/args.py:409
    assert DEFAULT_SKIP_PATTERNS == (
        "patch_embed", "pos_embed", "x_embedder", "context_embedder",
        "time_embed", "^proj_in$", "^proj_out$", "norm")

def test_dotted_skip_patterns_and_matched_nothing_refusal():
    """Reference-style dotted module patterns (diffusers matches fully-
    qualified names like 'blocks.0.ff.net_0') must work, and a pattern set
    matching nothing must raise instead of silently casting every leaf
    (which would lose the tree's compute dtype)."""
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2)
    params = _params(mcfg)

    cast = cast_layerwise_storage(
        params, "float8_e4m3fn", DEFAULT_SKIP_PATTERNS + ("ff.net",))
    blk = cast["blocks"][0]
    assert blk["ff"]["net_0"]["kernel"].dtype == jnp.bfloat16
    assert blk["attn1"]["to_q"]["kernel"].dtype == jnp.float8_e4m3fn

    with pytest.raises(ValueError, match="matched no module"):
        cast_layerwise_storage(params, "float8_e4m3fn", ("zzz_nothing",))
    with pytest.raises(ValueError, match="matched no module"):
        cast_layerwise_storage(params, "float8_e4m3fn", ("",))

    with pytest.raises(ValueError, match="bad regex"):
        TrainingArgs(pretrained_model_name_or_path="x",
                     layerwise_upcasting_skip_modules_pattern="(").validate()
