"""Parallelism: mesh helpers, graph partitioning, sharded segment ops."""

from yolat_tpu.parallel.mesh import make_mesh, replicate, shard_leading_axis
from yolat_tpu.parallel.partition import (
    random_partition_graph,
    generate_sub_graphs,
    sharded_segment_sum,
)
