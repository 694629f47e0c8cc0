"""Graph partitioning + sharded segment reductions.

Counterparts of the reference's (unused) DeepGCN partition helpers
random_partition_graph / generate_sub_graphs (utils/data_util.py:43-61),
plus the framework's own scaling primitive for giant SVGs: an edge-sharded
segment-sum whose partials psum across the mesh axis — the analog of
"sequence parallelism" for graph workloads (SURVEY.md section 5: the
scaling axis of this domain is graph size, not sequence length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_partition_graph(num_nodes: int, cluster_number: int = 10,
                           rng: np.random.Generator | None = None) -> np.ndarray:
    """Uniform random node -> cluster assignment (data_util.py:43-47)."""
    rng = rng or np.random.default_rng()
    return rng.integers(0, cluster_number, size=num_nodes)


def generate_sub_graphs(edge: np.ndarray, parts: np.ndarray,
                        cluster_number: int = 10, batch_size: int = 1):
    """Group nodes/edges by cluster batches (data_util.py:50-61 semantics):
    returns per-batch (node_ids, edge_subset) with edges whose BOTH
    endpoints fall in the batch's clusters, reindexed locally."""
    num_batches = (cluster_number + batch_size - 1) // batch_size
    out = []
    for b in range(num_batches):
        sel_clusters = range(b * batch_size, min((b + 1) * batch_size, cluster_number))
        node_mask = np.isin(parts, list(sel_clusters))
        node_ids = np.where(node_mask)[0]
        local = -np.ones(len(parts), dtype=np.int64)
        local[node_ids] = np.arange(len(node_ids))
        keep = node_mask[edge[:, 0]] & node_mask[edge[:, 1]]
        out.append((node_ids, local[edge[keep]]))
    return out


def sharded_segment_sum(data, segment_ids, num_segments: int, axis_name: str,
                        mask=None, indices_are_sorted: bool = False):
    """Edge-sharded segment-sum: each device reduces its local edge shard,
    partial results psum across the mesh axis. Call inside shard_map with
    `data`/`segment_ids`/`mask` sharded along edges and segment ids global.

    This is the building block for splitting one giant SVG's edge set over
    ICI (the stretch component of SURVEY.md section 2.5c).
    """
    from yolat_tpu.ops.segment import segment_sum

    local = segment_sum(data, segment_ids, num_segments, mask=mask,
                        indices_are_sorted=indices_are_sorted)
    return jax.lax.psum(local, axis_name)


def edge_sharded_gp2_layer(conv, x, edge, e_attr, edge_mask, axis_name: str,
                           edges_sorted: bool = False):
    """Eval-mode canonical conv (AttrRelativeEdgeConvGlobalPool2 message
    path) with the EDGE SET sharded across the mesh axis — the giant-SVG
    scaling path (SURVEY.md section 2.5c / section 5: this domain's analog
    of sequence parallelism is graph size).

    Call inside shard_map with:
      x          [N, Ci]  node features, REPLICATED (P()),
      edge       [E/D, 2] this device's edge shard (P(axis)),
      e_attr     [E/D, A] / edge_mask [E/D] sharded alike,
      conv       folded conv params (eval/fast_forward.fold_params entry:
                 w1, sc1, w2, sc2, wr, br).

    Each device gathers + runs the message MLP for its edge shard only;
    the masked mean is two psums (partial sums + partial counts) over ICI.
    Returns the REPLICATED [N, Co] layer output — bitwise the single-device
    eval conv up to reduction order.
    """
    n = x.shape[0]
    x_i = x[edge[:, 1]]
    x_j = x[edge[:, 0]]
    f = jnp.concatenate([x_i, x_j - x_i, e_attr], axis=1)
    h = jnp.maximum(f @ conv["w1"] * conv["sc1"][0] + conv["sc1"][1], 0.0)
    h = jnp.maximum(h @ conv["w2"] * conv["sc2"][0] + conv["sc2"][1], 0.0)
    # pass edges_sorted=True when shards are contiguous slices of a
    # dst-sorted packed edge list (the pack_files contract); ad-hoc edge
    # lists must keep the default
    agg = sharded_segment_mean(h, edge[:, 1], n, axis_name, mask=edge_mask,
                               indices_are_sorted=edges_sorted)
    return agg + x @ conv["wr"] + conv["br"].reshape(1, -1)


def sharded_segment_mean(data, segment_ids, num_segments: int, axis_name: str,
                         mask=None, indices_are_sorted: bool = False):
    from yolat_tpu.ops.segment import segment_sum

    local = segment_sum(data, segment_ids, num_segments, mask=mask,
                        indices_are_sorted=indices_are_sorted)
    if mask is not None:
        ones = mask.astype(data.dtype)
    else:
        ones = jnp.ones(data.shape[0], data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments,
                      indices_are_sorted=indices_are_sorted)
    total = jax.lax.psum(local, axis_name)
    count = jax.lax.psum(cnt, axis_name)
    return total / jnp.maximum(count, 1.0)[
        (slice(None),) + (None,) * (total.ndim - 1)
    ]
