"""TPU op library: the kernel surface of the framework.

Replaces the reference's native dependency kernels (SURVEY.md section 2.4):
torch_scatter segment reductions, PyG gather/scatter message passing,
torchvision NMS, torch_cluster kNN. Every op has a jnp reference
implementation; hot ops additionally have Pallas kernels with equivalence
tests (ops/pallas_kernels.py).
"""

from yolat_tpu.ops.segment import (
    segment_mean,
    segment_max,
    segment_sum,
    segment_softmax,
)
from yolat_tpu.ops.iou import box_iou_matrix, box_iou_plus1, box_iou_pairwise
from yolat_tpu.ops.nms import batched_class_nms
from yolat_tpu.ops.knn import knn_graph
