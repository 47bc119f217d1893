"""Sources: synthetic Common-Crawl-style pages, polygon layers, readers."""

from .pages import generate_pages_dataset, page_count_for_sf, pages_parquet_path
from .polygons import generate_polygon_layer

__all__ = [
    "generate_pages_dataset",
    "page_count_for_sf",
    "pages_parquet_path",
    "generate_polygon_layer",
]
