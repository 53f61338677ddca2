"""Dyadic Interaction Modeling, rebuilt TPU-native (JAX / XLA / Pallas / pjit).

A ground-up re-implementation of the capabilities of
Boese0601/Dyadic-Interaction-Modeling ("DIM"): VQ-VAE facial-motion
tokenizers, dyadic masked/autoregressive seq2seq pretraining (SLM),
listener / speaker generation finetunes, speech-driven animation
(CodeTalker), evaluation metrics (FD / SID / STS / LVE / FDD), and the
PIRender neural renderer - all designed for TPU from the start:

* compute path: jax + flax.linen modules, Pallas kernels for the hot ops
  (fused L2 nearest-codebook quantization, attention),
* autoregressive decode: jitted ``lax.scan`` over a preallocated KV cache
  (the reference re-runs a full forward per generated token),
* parallelism: ``jax.sharding.Mesh`` + ``NamedSharding``; gradients are
  reduced by XLA collectives over ICI instead of NCCL all-reduce,
* checkpointing: orbax with partial-load / freeze-mask semantics.

Package layout (mirrors the reference's layer map, SURVEY.md section 1):
  config        L0 config system  (reference: code/base/config.py)
  utils         L0 logging / meters / schedules / checkpointing
  ops           L2 core op library (reference: code/models/lib/*)
  models        L3 model zoo (VQ-VAEs, SLM family, CodeTalker, wav2vec2)
  engine        L4 train / eval engines
  metrics       L5 losses + eval metrics
  data          L1 datasets / loaders / preprocessing
  postprocess   L6 smoothing + export
  render        L7 PIRender (JAX)
  parallel      device-mesh + collective helpers
"""

__version__ = "0.1.0"
