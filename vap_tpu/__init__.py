"""vap_tpu — a TPU-native (JAX/XLA/Pallas) Video-As-Prompt framework.

Capabilities mirror bytedance/Video-As-Prompt (reference layout documented in
SURVEY.md): a frozen image-to-video Diffusion Transformer (CogVideoX-I2V /
Wan2.1-I2V) guided by a plug-and-play Mixture-of-Transformers (MoT) expert with
joint full attention over [target ‖ reference] token streams and temporally
biased RoPE on the reference tokens.

The architecture is TPU-first:
  * pure-functional model definitions (param pytrees + jit-scanned block stacks)
  * Pallas flash-attention over the joint token stream
  * jax.sharding Mesh (data, fsdp, seq, model) for multi-chip scale
  * orbax checkpointing, optax optimizers, host-side data pipeline
"""

__version__ = "0.1.0"
