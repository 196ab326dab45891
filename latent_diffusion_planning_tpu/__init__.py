"""latent_diffusion_planning_tpu — a TPU-native rebuild of Latent Diffusion Planning.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
``amberxie88/latent_diffusion_planning`` (imitation-learning policies trained by
latent-space diffusion planning + inverse dynamics), re-architected TPU-first:

- device-resident batched simulation (``envs/``) instead of CPU MuJoCo worker
  processes,
- a single fused plan→act→step rollout under ``lax.scan`` (``eval_/rollout.py``)
  instead of multiprocessing queues,
- explicit ``jax.sharding`` mesh parallelism (``parallel/``) instead of implicit
  positional sharding,
- in-house diffusion schedulers and VAE (``ops/diffusion.py``, ``models/vae.py``)
  instead of HuggingFace diffusers,
- on-device dataset sampling from welded HBM-resident arrays (``data/``) instead
  of torch DataLoader worker processes.

Reference capability map: see SURVEY.md at the repository root.
"""

__version__ = "0.1.0"
