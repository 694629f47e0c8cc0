"""Flax model library: MLP/norm primitives, the graph-conv registry, the
YOLaT backbone + detection head, and losses."""

from yolat_tpu.nn.layers import MLP, MaskedBatchNorm
from yolat_tpu.nn.conv import CONV_REGISTRY, make_conv
from yolat_tpu.nn.model import Backbone, SparseCADGCN, detection_loss
