"""TuneVLSeg-TPU: a TPU-native JAX/Flax framework for prompt tuning of
vision-language segmentation models.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capability surface as the reference PyTorch-Lightning framework
(naamiinepal/tunevlseg): six prompt-tuning strategies (CoOp, CoCoOp, VPT,
MaPLe, Shared-Separate, Shared-Attention) injected into CLIPSeg and CRIS,
end-to-end fine-tuning, and the binary image-text-mask benchmark harness.

Layout:
  models/    Flax model families (CLIP towers, CLIPSeg, CRIS, prompt learners)
  nn/        shared neural-net building blocks (attention, layers)
  ops/       numerical ops (losses, metrics, image resampling as matmuls)
  convert/   PyTorch checkpoint -> JAX pytree converters
  data/      host-side input pipeline (datasets, tokenizer, transforms)
  parallel/  mesh construction + sharded train/eval steps (pjit/shard_map)
  training/  optimizer groups, schedules, checkpointing, the train loop
  config/    lightweight Hydra-compatible YAML config composer
"""

__version__ = "0.1.0"
