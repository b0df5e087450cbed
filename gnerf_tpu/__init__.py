"""gnerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for single-view
geometry-enhanced novel view synthesis, with the full capability surface of
G-NeRF (CVPR 2024): identity encoder -> tri-plane StyleGAN2 generator ->
two-pass volumetric renderer -> superresolution, plus training, inference,
and shape-extraction tooling.

Layer map (mirrors SURVEY.md section 1, redesigned TPU-first):
  ops/       L0: resampling / activation / sampling primitives as XLA & Pallas ops
  models/    L2/L4: StyleGAN2 backbone, encoder, superresolution, tri-plane generator
  render/    L3: ray sampling, importance sampling, ray marching
  parallel/  mesh + sharding utilities (data / ray axes), collectives
  utils/     config registry, cameras, checkpointing, stats, misc
  training/  L5: datasets, losses, train loop
  infer/     L6: video generation, shape extraction
"""

__version__ = "0.1.0"
