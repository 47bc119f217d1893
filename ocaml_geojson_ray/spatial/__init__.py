"""Spatial layer: hierarchical cells, PIP, joins, kNN, tiles, skew."""
