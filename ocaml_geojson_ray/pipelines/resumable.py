"""Resumable flagship run (SURVEY.md §2.2 N10 end-to-end).

The input pages table is processed SHARD BY SHARD (one shard = one
input parquet file); each shard's output lands in
``out/part=<shard>/`` atomically with a manifest entry recording its
lineage metrics (pages, candidates, valid/invalid features, matches).
A rerun skips completed shards — resume-from-checkpoint without
recomputation. Within a shard, Ray's task retry handles transient
worker failures.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..spatial.join import broadcast_polygon_index, join_batch_fn
from ..state.checkpoint import run_resumable
from ..stages.extract import extract_text_batch
from ..stages.mine import GeoJsonMiner
from ..stages.parse_stage import parse_candidates_batch


def flagship_resumable(pages_dir: str, polygons_path: str, out_dir: str) -> dict:
    """Run (or resume) the flagship over every page shard. Returns
    {shard: metrics} for shards processed in THIS invocation."""
    import ray
    import ray.data as rd

    shards = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    index_ref = broadcast_polygon_index(polygons_path)

    def run_shard(shard_path: str, dest: str) -> dict:
        ds = rd.read_parquet(shard_path)
        feats = (
            ds.map_batches(extract_text_batch, batch_format="pyarrow")
            .drop_columns(["text"])
            .map_batches(GeoJsonMiner("extracted_text"), batch_format="pyarrow")
            .map_batches(parse_candidates_batch, batch_format="pyarrow")
        ).materialize()
        # lineage metrics for the manifest: one DISTRIBUTED reduce
        # (Count + Sum aggregate), not driver-side batch iteration
        from ray.data.aggregate import Count, Sum

        agg = feats.map_batches(
            lambda b: pa.table({"ok_i": pc.cast(b["ok"], pa.int64())}),
            batch_format="pyarrow",
        ).aggregate(Count(alias_name="n_rows"), Sum("ok_i", alias_name="n_valid"))
        n_rows = int(agg.get("n_rows") or 0)
        n_valid = int(agg.get("n_valid") or 0)
        pts = feats.map_batches(
            lambda b: b.filter(pc.and_(pc.equal(b["geom_type"], "Point"), b["ok"])),
            batch_format="pyarrow",
        )
        joined = pts.map_batches(
            join_batch_fn, fn_kwargs={"index_ref": index_ref},
            batch_format="pyarrow",
        ).materialize()  # consumed twice (write + count): run the join once
        joined.write_parquet(dest)
        n_matched = joined.count()
        return {
            "n_feature_rows": int(n_rows),
            "n_valid": int(n_valid),
            "n_invalid": int(n_rows - n_valid),
            "n_matched": int(n_matched),
        }

    def shard_key(p: str) -> str:
        return os.path.splitext(os.path.basename(p))[0]

    return run_resumable(
        [shard_key(p) for p in shards],
        out_dir,
        lambda shard, dest: run_shard(
            next(p for p in shards if shard_key(p) == shard), dest
        ),
    )
