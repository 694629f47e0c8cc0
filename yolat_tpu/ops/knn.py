"""Dense top-k kNN graph construction.

Replaces torch_cluster.knn_graph / the dense pairwise top-k used by the
reference's dynamic-graph blocks (gcn_lib/sparse/torch_edge.py:53-113 and
gcn_lib/dense/torch_edge.py:45): negative squared euclidean distance top-k
maps directly onto jax.lax.top_k, which XLA tiles onto the MXU/VPU.

Supports masked (padded) point sets and dilated/stochastic edge
subsampling (the reference Dilated wrapper, torch_edge.py:6-29).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def knn_graph(x, k: int, mask=None, segment_ids=None):
    """k nearest neighbours per point (excluding self).

    Args:
      x:    [N, C] points.
      k:    neighbour count.
      mask: [N] bool validity (padded points are never neighbours).
      segment_ids: [N] int — restrict neighbours to the same segment (the
        flat-packed-batch analog of the reference's per-sample batch-offset
        kNN, torch_edge.knn_matrix:66-99: neighbours never cross images).

    Returns (edge_index [2, N*k] int32 (src=neighbour j, dst=centre i),
             edge_mask [N*k] bool).
    """
    n = x.shape[0]
    x2 = jnp.sum(x * x, axis=1)
    # negative squared distance; self excluded with a penalty BELOW the
    # mask/segment penalty so top_k tie-breaks never resurrect the self
    # edge when a segment has <= k members
    neg_d = 2.0 * (x @ x.T) - x2[:, None] - x2[None, :]
    neg_d = neg_d - jnp.eye(n, dtype=x.dtype) * 2e30
    if mask is not None:
        neg_d = jnp.where(mask[None, :], neg_d, -1e30)
    if segment_ids is not None:
        same = segment_ids[:, None] == segment_ids[None, :]
        neg_d = jnp.where(same, neg_d, -1e30)
    _, idx = jax.lax.top_k(neg_d, k)  # [N, k] neighbour ids

    dst = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    src = idx.reshape(-1).astype(jnp.int32)
    edge_mask = src != dst  # belt and braces vs tie-broken self picks
    if mask is not None:
        edge_mask = edge_mask & mask[dst] & mask[src]
    if segment_ids is not None:
        # segments smaller than k force cross-segment picks; mask them out
        edge_mask = edge_mask & (segment_ids[dst] == segment_ids[src])
    return jnp.stack([src, dst], axis=0), edge_mask


def dilated(edge_index, edge_mask, k: int, dilation: int = 1,
            stochastic: bool = False, epsilon: float = 0.0, key=None):
    """Dilated edge subsampling (torch_edge.py Dilated:6-29): keep every
    `dilation`-th neighbour, or a random k-subset with prob epsilon when
    stochastic (training only)."""
    if dilation <= 1:
        return edge_index, edge_mask
    n_center = edge_index.shape[1] // (k * dilation)
    ei = edge_index.reshape(2, n_center, k * dilation)
    em = edge_mask.reshape(n_center, k * dilation)
    if stochastic and key is not None:
        use_random = jax.random.uniform(key) < epsilon
        perm = jax.random.permutation(key, k * dilation)[:k]
        strided = jnp.arange(0, k * dilation, dilation)
        sel = jnp.where(use_random, perm, strided)
    else:
        sel = jnp.arange(0, k * dilation, dilation)
    return ei[:, :, sel].reshape(2, -1), em[:, sel].reshape(-1)
