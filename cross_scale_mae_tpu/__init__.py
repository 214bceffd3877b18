"""Cross-Scale MAE, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``aicip/Cross-Scale-MAE`` (NeurIPS 2023): self-supervised multi-scale masked
autoencoder pretraining for remote-sensing imagery, plus supervised finetune
and linear-probe evaluation of the pretrained encoder.

Design principles (TPU-first, not a port):

* **One XLA program per step.** Augmentation (normalize / flips / loop-free
  RandomResizedCrop), patchify, per-sample masking, the two-view forward,
  every loss term, the backward pass and the optimizer all compile into a
  single ``jit`` step. The reference pays three host syncs per step
  (``engine_pretrain.py:55,72,79``); here metrics are fetched asynchronously.
* **Functional core.** Parameters are plain pytrees; models are pure
  ``init`` / ``apply`` functions driven by frozen dataclass configs. The
  reference's seven ``MAE_ViT_Ms*`` subclasses collapse into one model with a
  set of composable loss terms (``models/mae.py``).
* **SPMD via mesh + shardings.** Data parallelism is batch sharding over a
  ``jax.sharding.Mesh`` axis; gradient reduction is inserted by XLA (the
  NCCL-DDP equivalent), with a tensor-parallel ``model`` axis hook.
* **MXU-shaped compute.** bf16 activations, fp32 params/optimizer; patch
  embedding is an explicit reshape+matmul; the two scale views are batched
  into one forward so every matmul is twice as large.
"""

__version__ = "0.1.0"

from cross_scale_mae_tpu import configs  # noqa: F401
