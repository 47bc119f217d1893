"""Flagship pipeline: pages → extract → mine → parse (→ spatial stages).

Restates the reference's three entry shapes (SURVEY.md §3.4) as one
streaming Ray Data pipeline: read parquet (column-pruned) →
map_batches(extract) → map_batches(mine) → map_batches(parse) with
verdict columns, ready for cells/join/tiles downstream.
"""

from __future__ import annotations

from ..stages.extract import extract_text_batch
from ..stages.mine import GeoJsonMiner
from ..stages.parse_stage import parse_candidates_batch


def read_pages(pages_path: str, with_html: bool = True):
    """Column-pruned parquet read of the pages table."""
    import ray.data as rd

    cols = ["url", "warc_ts", "html", "text", "lang"] if with_html else [
        "url",
        "warc_ts",
        "text",
        "lang",
    ]
    return rd.read_parquet(pages_path, columns=cols)


def mined_candidates(pages_path: str, concurrency=None):
    """pages → extracted text → mined GeoJSON candidate docs."""
    ds = read_pages(pages_path)
    # html → text: stateless vectorized task stage; drops html ASAP
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow", batch_size=512)
    ds = ds.drop_columns(["text"])  # carried only for the invariant check
    ds = ds.map_batches(
        GeoJsonMiner("extracted_text"),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
    )
    return ds


def parsed_features(pages_path: str, concurrency=None):
    """pages → … → parsed per-feature rows with verdict columns."""
    ds = mined_candidates(pages_path, concurrency=concurrency)
    return ds.map_batches(
        parse_candidates_batch, batch_format="pyarrow", batch_size=1024
    )
