"""yolat_tpu — a TPU-native vector-graphics recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
microsoft/YOLaT-VectorGraphicsRecognition (YOLaT, NeurIPS 2021; YOLaT++,
TPAMI 2024): object detection directly on vector graphics (SVG), without
rasterization.

Layers (see SURVEY.md for the reference layer map):
  geom/     L0+L1: CPU geometry kernel — SVG parse -> Bezier graph -> merged
            graph -> connected components -> grid proposals. Pure numpy,
            deterministic, emits fixed-schema packed arrays.
  ops/      TPU op library: segment reductions, fused gather-MLP-scatter
            (Pallas), IoU, on-device NMS, top-k kNN graphs.
  nn/       Flax models: conv registry (attr_edge_gp2 canonical), Backbone,
            SparseCADGCN detection head, DetectionLoss.
  data/     Packing/bucketing batcher, augmentation, mixup, synthetic SESYD
            fixture generator.
  train/    pjit/shard_map data-parallel train loop, optimizers, Orbax
            checkpoints, typed config.
  eval/     Two-pass on-device prediction, NMS, mAP@[.5:.95] protocol.
  parallel/ Mesh helpers and collectives.
"""

__version__ = "0.1.0"
