"""Join variants: CellEncoder actor stage, large-large partitioned
join, resumable flagship."""

import numpy as np
import pyarrow as pa
import pytest


def test_cell_encoder_stage(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.spatial import cells as C
    from ocaml_geojson_ray.spatial.join import CellEncoder

    t = pa.table({
        "lng": pa.array([2.35, -58.4, float("nan")], pa.float64()),
        "lat": pa.array([48.85, -34.6, float("nan")], pa.float64()),
    })
    out = rd.from_arrow(t).map_batches(
        CellEncoder, fn_constructor_kwargs={"res": 9, "s2_level": 11},
        batch_format="pyarrow", concurrency=1,
    ).take_all()
    want = int(C.latlng_to_cell(2.35, 48.85, 9))
    assert out[0]["cell"] == want
    assert out[0]["s2_cell"] == int(C.s2_latlng_to_cell(2.35, 48.85, 11))
    assert out[2]["cell"] == -1  # nan rows flagged


def test_cell_partitioned_join_matches_broadcast(ray_session):
    """Large-large plan produces the same matches as the broadcast
    plan on the same inputs."""
    import ray.data as rd

    from ocaml_geojson_ray.pipelines.queries import rect_polygons_rows
    from ocaml_geojson_ray.spatial.join import (
        cell_partitioned_join,
        spatial_join_points,
    )

    sf = "/root/testdata/sf0.001"
    rows = rect_polygons_rows(sf)
    from ocaml_geojson_ray.pipelines.queries import lineitem_points

    pts = lineitem_points(sf)
    want = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["poly_id"])
        for r in spatial_join_points(pts, rows, res=7).take_all()
    )

    polys_ds = rd.from_items(
        [
            {
                "poly_id": r["poly_id"],
                "rings": r["rings"],
                "minx": r["minx"],
                "miny": r["miny"],
                "maxx": r["maxx"],
                "maxy": r["maxy"],
            }
            for r in rows
        ]
    )
    got_ds = cell_partitioned_join(lineitem_points(sf), polys_ds, res=7)
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["poly_id"])
        for r in got_ds.take_all()
    )
    assert got == want and len(want) > 0


def test_flagship_resumable(ray_session, tmp_path):
    from ocaml_geojson_ray.pipelines.resumable import flagship_resumable
    from ocaml_geojson_ray.sources.pages import materialize_pages_parquet
    from ocaml_geojson_ray.sources.polygons import generate_polygon_layer

    pages = materialize_pages_parquet(0.0005, root=str(tmp_path))
    polys = generate_polygon_layer(0.01, root=str(tmp_path))
    out = str(tmp_path / "flag_out")
    first = flagship_resumable(pages, polys, out)
    assert first  # all shards processed
    total_rows = sum(m["n_feature_rows"] for m in first.values())
    assert total_rows > 0
    for m in first.values():
        assert m["n_valid"] + m["n_invalid"] == m["n_feature_rows"]
    # second run: nothing to do (manifest complete)
    second = flagship_resumable(pages, polys, out)
    assert second == {}


def test_spatial_join_features_mixed(ray_session, tmp_path):
    """Mixed-geometry join: points via PIP, other geometries via
    envelope overlap, unioned with a join_kind tag."""
    from ocaml_geojson_ray.pipelines.flagship import parsed_features
    from ocaml_geojson_ray.sources.pages import materialize_pages_parquet
    from ocaml_geojson_ray.sources.polygons import generate_polygon_layer
    from ocaml_geojson_ray.spatial.join import spatial_join_features

    pages = materialize_pages_parquet(0.0005, root=str(tmp_path))
    polys = generate_polygon_layer(0.01, root=str(tmp_path))
    feats = parsed_features(pages)
    out = spatial_join_features(feats, polys).take_all()
    kinds = {r["join_kind"] for r in out}
    assert "envelope" in kinds  # polygons/linestrings matched by bbox
    for r in out:
        assert r["poly_id"] is not None


def test_partitioned_parquet_sink(ray_session, tmp_path):
    """Hive-style partitioned output (resumable layout per key range):
    write_parquet(partition_cols) → one directory per lang, readable
    back per partition."""
    import pathlib

    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "by_lang")
    ds.write_parquet(out, partition_cols=["lang"])
    parts = sorted(p.name for p in pathlib.Path(out).iterdir() if p.is_dir())
    assert parts and all(p.startswith("lang=") for p in parts)
    one = rd.read_parquet(out + "/" + parts[0]).count()
    assert one > 0
    total = rd.read_parquet(out).count()
    assert total == ds.count()
