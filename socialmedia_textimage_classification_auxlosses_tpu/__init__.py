"""TPU-native multimodal social-media text+image classification framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``danaesavi/SocialMedia-TextImage-Classification-AuxLosses`` (EACL Findings
2024): text encoders (BERT/BERTweet/RoBERTa/Bernice), image encoders
(ViT/BEiT/DEiT/ResNet), dual-encoder late fusion with four fusion heads,
ViLT/LXMERT early fusion, and the two auxiliary losses of the paper —
image-text contrastive (ITC) and image-text matching (ITM/TIM) — compiled
into single jitted train/eval steps, sharded over a ``jax.sharding.Mesh``.

Layout (mirrors SURVEY.md section 7):
  core/      config dataclasses + task registry + RNG threading
  data/      tweet normalization, CSV prep, tokenizers, image ingest, batching
  models/    flax towers, dual encoder, fusion heads, ViLT, LXMERT
  ops/       Pallas TPU kernels (fused attention) with reference fallbacks
  parallel/  device mesh + sharding rules + collectives
  train/     losses, ITM sampling, train/eval steps, metrics, checkpointing
  cli/       run_txt / run_img / run_mm_late / run_mm_early / obj_features
"""

__version__ = "0.1.0"
