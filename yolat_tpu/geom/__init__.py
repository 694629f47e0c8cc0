"""L0/L1 geometry kernel: SVG -> Bezier-curve graph, on CPU, in numpy.

Deterministic preprocessor for the TPU pipeline. Behavioural contract follows
the reference pipeline (SVGParser -> split_cross -> Bezier conversion ->
graph build -> node merge -> connected-component merge), re-derived and
vectorised; see per-module docstrings for reference citations.
"""

from yolat_tpu.geom.svg_io import SVGDocument, read_ground_truth_boxes
from yolat_tpu.geom.arc2bezier import arc_to_cubics
from yolat_tpu.geom.bezier import (
    line_to_cubic,
    circle_to_cubics,
    path_to_cubics,
    shapes_to_primitives,
)
from yolat_tpu.geom.split_cross import split_cross
from yolat_tpu.geom.graph_build import (
    cubics_to_graph,
    merge_nodes,
    merge_connected_components,
    build_svg_graph,
)
