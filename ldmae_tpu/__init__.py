"""ldmae_tpu — TPU-native JAX framework for LDMAE.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the LDMAE
reference pipeline (isno0907/ldmae): a VMAE image tokenizer, the LightningDiT
diffusion transformer, flow-matching ("transport") training, on-device ODE/SDE
sampling with classifier-free guidance, latent-shard data infrastructure, and
the FID/rFID/IS/Precision/Recall evaluation stack.

Design principles (TPU-first, not a port):
  * pure functions over parameter pytrees; one jitted train step
  * bf16 compute on the MXU with fp32 parameters/optimizer
  * ``lax.scan`` over transformer depth and over ODE steps (static shapes)
  * SPMD via ``jax.sharding.Mesh`` (dp/fsdp/tp axes); XLA inserts collectives
  * Pallas kernels for the hot ops (flash attention, fused adaLN)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("LDMAE_PLATFORM"):
    # Force a jax platform (e.g. "cpu" for tests/tools) even when a site
    # customisation pre-set jax_platforms (the axon TPU tunnel does).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["LDMAE_PLATFORM"])
