"""Point-cloud / graph visualisation helpers.

Functional replacement for the reference's VTK viewer (utils/pc_viz.py —
DeepGCN leftover): matplotlib scatter/segment rendering of point sets and
graphs with per-point colouring, saved to file (headless environments).
"""

from __future__ import annotations

import numpy as np


def plot_points(points: np.ndarray, colors=None, out_path: str = "points.png",
                size: float = 4.0):
    """points [N, 2] or [N, 3] (3-D drawn as a projection)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    points = np.asarray(points)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(points[:, 0], points[:, 1], c=colors, s=size, cmap="tab20")
    ax.set_aspect("equal")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out_path


def plot_graph(pos: np.ndarray, edges: np.ndarray, node_colors=None,
               out_path: str = "graph.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection

    pos = np.asarray(pos)
    edges = np.asarray(edges).reshape(-1, 2)
    fig, ax = plt.subplots(figsize=(8, 8))
    segs = np.stack([pos[edges[:, 0]], pos[edges[:, 1]]], axis=1)
    ax.add_collection(LineCollection(segs, colors="0.6", linewidths=0.8))
    ax.scatter(pos[:, 0], pos[:, 1], c=node_colors, s=8, cmap="tab20", zorder=2)
    ax.autoscale()
    ax.set_aspect("equal")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out_path
