"""representationlearning_tpu — TPU-native framework with the capabilities of
Rongtao-Xu/RepresentationLearning, rebuilt idiomatically on JAX/XLA/Pallas/pjit.

Subpackages
-----------
core      config tree, registry, logging/metrics plumbing
parallel  device-mesh / sharding / collective helpers (DDP -> pjit+pmean, halo exchange)
data      datasets (VOC12, COCO14, LoveDA, paired-medical) and the augmentation chain
models    flax model zoo: MiT/SegFormer (SCD/RML), ResNet-50 CAM nets + IRN (WaveCAM),
          HRNet + interlaced-window transformer (RSSFormer), dual-stream UNet (DRFL)
ops       numeric kernels: torch-semantics image ops, bilateral/permutohedral filter,
          Pallas TPU kernels for the hot paths
losses    WSSS losses (aux/seg/energy/corr), MI losses (RML), CGFL (RSSFormer), dice (DRFL)
wsss      CAM utilities, pseudo-label machinery, random-walk propagation, pipeline DAG
train     unified iteration-based trainer, optimizers/schedules, checkpointing
infer     sliding-window sharded inference with halo exchange, TTA
convert   PyTorch-checkpoint -> JAX param-tree converters
metrics   segmentation metrics (fast-hist mIoU, F1, Dice)
"""

__version__ = "0.1.0"
