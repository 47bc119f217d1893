"""Spatial layer: hierarchical cells, PIP, joins, kNN, tiles, skew."""

from . import cells, pip, tiles
from .join import (
    CellEncoder,
    EnvelopeJoiner,
    PolygonIndex,
    SpatialJoiner,
    broadcast_polygon_index,
    cell_partitioned_join,
    envelope_join,
    spatial_join_features,
    spatial_join_points,
)
from .knn import KnnJoiner, PointKnn, knn_point_to_point, knn_points
from .skew import (
    add_salt_column,
    detect_hot_cells,
    salted_grouped_sum,
    split_hot_cells_batch,
)

__all__ = [
    "cells", "pip", "tiles",
    "CellEncoder", "EnvelopeJoiner", "PolygonIndex", "SpatialJoiner",
    "broadcast_polygon_index", "cell_partitioned_join", "envelope_join",
    "spatial_join_features", "spatial_join_points",
    "KnnJoiner", "PointKnn", "knn_point_to_point", "knn_points",
    "add_salt_column", "detect_hot_cells", "salted_grouped_sum",
    "split_hot_cells_batch",
]
