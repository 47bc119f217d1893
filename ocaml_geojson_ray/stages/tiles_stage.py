"""Raster↔vector tile assignment + tile aggregation (N7, N12).

Stateless map_batches: each parsed feature → (z, x, y) tile rows at the
configured zooms (points exact; other geometries by envelope cover,
documented in spatial/tiles.py). Tile stats are a grouped aggregation
with map-side pre-aggregation: counts are combined per batch BEFORE the
groupby shuffle, so the exchange carries one row per (tile, batch)
instead of one per feature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..spatial import tiles as T

DEFAULT_ZOOMS = (4, 8, 12)


def assign_tiles_batch(batch: pa.Table, zooms=DEFAULT_ZOOMS) -> pa.Table:
    """features (needs lng/lat or minx..maxy) → exploded tile rows."""
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    minx = batch["minx"].to_numpy(zero_copy_only=False)
    miny = batch["miny"].to_numpy(zero_copy_only=False)
    maxx = batch["maxx"].to_numpy(zero_copy_only=False)
    maxy = batch["maxy"].to_numpy(zero_copy_only=False)
    urls = batch["url"].to_pylist() if "url" in batch.column_names else [None] * len(batch)
    geom_t = (
        batch["geom_type"].to_pylist()
        if "geom_type" in batch.column_names
        else [None] * len(batch)
    )

    out_url, out_geom, out_z, out_x, out_y = [], [], [], [], []
    is_point = ~np.isnan(lng)
    has_env = ~np.isnan(minx)
    for z in zooms:
        # vectorized point path
        px, py = T.point_to_tile(lng[is_point], lat[is_point], z)
        for i, (xx, yy) in zip(np.flatnonzero(is_point), zip(px, py)):
            out_url.append(urls[i])
            out_geom.append(geom_t[i])
            out_z.append(z)
            out_x.append(int(xx))
            out_y.append(int(yy))
        # envelope path for non-points
        for i in np.flatnonzero(has_env & ~is_point):
            xs, ys = T.envelope_to_tiles(minx[i], miny[i], maxx[i], maxy[i], z)
            for xx, yy in zip(xs, ys):
                out_url.append(urls[i])
                out_geom.append(geom_t[i])
                out_z.append(z)
                out_x.append(int(xx))
                out_y.append(int(yy))
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "geom_type": pa.array(out_geom, pa.string()),
            "z": pa.array(out_z, pa.int32()),
            "x": pa.array(out_x, pa.int64()),
            "y": pa.array(out_y, pa.int64()),
        }
    )


def partial_tile_counts(batch: pa.Table) -> pa.Table:
    """Map-side combiner: collapse a batch to one row per tile before
    the shuffle (pre-aggregation pattern, ray_guide 'Aggregation at
    scale')."""
    t = batch.group_by(["z", "x", "y"]).aggregate([("z", "count")])
    return t.rename_columns(["z", "x", "y", "partial_count"])


def tile_stats(features_ds, zooms=DEFAULT_ZOOMS,
               small_partials: int = 2_000_000):
    """features → per-tile feature counts (small result).

    Size-adaptive combine (the pivot/dedup precedent): the map-side
    partials are one row per (block, tile); below ``small_partials``
    rows they funnel to one reduceat task — Ray's sort-backed groupby
    machinery alone costs ~1.4 s on this table shape — and above it
    (deep zooms × huge corpora) the key shuffle is the honest plan."""
    from ray.data.aggregate import Sum

    from ..util import grouped_sum_combine

    tiles_ds = features_ds.map_batches(
        assign_tiles_batch, batch_format="pyarrow", fn_kwargs={"zooms": tuple(zooms)}
    )
    partial = tiles_ds.map_batches(
        partial_tile_counts, batch_format="pyarrow").materialize()
    if partial.count() > small_partials:
        return partial.groupby(["z", "x", "y"]).aggregate(
            Sum("partial_count", alias_name="n_features")
        )
    return grouped_sum_combine(partial, ["z", "x", "y"],
                               "partial_count", "n_features")


def tiles_to_features(stats_ds):
    """Raster → vector: each aggregated tile becomes a canonical
    GeoJSON Feature (Polygon of the tile bounds, stats as properties),
    serialized by the byte-exact engine serializer — the inverse
    direction of assign_tiles_batch, closing the raster↔vector loop."""
    from ..core.model import Feature, Geometry
    from ..core.serialize import feature_to_text

    def vectorize(batch: pa.Table) -> pa.Table:
        zs = batch["z"].to_pylist()
        xs = batch["x"].to_pylist()
        ys = batch["y"].to_pylist()
        ns = batch["n_features"].to_pylist()
        docs = []
        for z, x, y, n in zip(zs, xs, ys, ns):
            minlng, minlat, maxlng, maxlat = T.tile_bounds(z, x, y)
            ring = [
                [float(minlng), float(minlat)],
                [float(maxlng), float(minlat)],
                [float(maxlng), float(maxlat)],
                [float(minlng), float(maxlat)],
                [float(minlng), float(minlat)],
            ]
            f = Feature(
                geometry=Geometry("Polygon", [ring]),
                properties={"z": float(z), "x": float(x), "y": float(y),
                            "n_features": float(n)},
                properties_present=True,
            )
            docs.append(feature_to_text(f))
        return batch.append_column("feature_json", pa.array(docs, pa.string()))

    return stats_ds.map_batches(vectorize, batch_format="pyarrow")


def densest_tiles(features_ds, zooms=DEFAULT_ZOOMS, top: int = 20):
    """Global top-k (N11): count desc, deterministic (z, x, y)
    tie-break. The stats table is tile-grid-bounded, so the top-k is a
    whole-block lexsort over the funneled combine output rather than a
    Dataset.sort+limit pair (two more AllToAll ops on a tiny table;
    the old form also broke count ties arbitrarily)."""
    stats = tile_stats(features_ds, zooms)

    def topk(b: pa.Table) -> pa.Table:
        n = b["n_features"].to_numpy(zero_copy_only=False)
        order = np.lexsort((
            b["y"].to_numpy(zero_copy_only=False),
            b["x"].to_numpy(zero_copy_only=False),
            b["z"].to_numpy(zero_copy_only=False),
            -n,
        ))[:top]
        return b.take(pa.array(order))

    return stats.repartition(1).map_batches(
        topk, batch_format="pyarrow", batch_size=None)
