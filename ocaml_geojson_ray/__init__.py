"""ocaml_geojson_ray — a Ray-Data-native GeoJSON parse/validate + spatial engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference library geocaml/ocaml-geojson
(/root/reference), re-expressed Ray-Data-first:

- ``core``      pure-Python GeoJSON data model, verdict-exact parser
                (reference: src/geojson/geojson.ml), canonical ``%.16g``
                serializer (reference: src/geojsone/vendor/jsone/jsone.ml),
                optics accessors, random generator.
- ``sources``   synthetic Common-Crawl-style pages table + parquet readers.
- ``stages``    per-batch Ray Data transforms: extract / mine / parse /
                rewrite (map_props, map_geometry) / folds / text stats /
                dedup / ANN / multimodal plumbing.
- ``spatial``   hierarchical cell index, point-in-polygon, spatial join,
                kNN, slippy tiles, skew handling.
- ``state``     checkpoint manifests, per-partition counters/lineage.
- ``pipelines`` end-to-end flagship pipelines.

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions
are owned by the driver, ``bench.py`` or the test fixture.
"""

__version__ = "0.1.0"
