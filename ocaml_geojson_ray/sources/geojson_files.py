"""GeoJSON file sources and sinks (SURVEY.md §2.1 S1-S3, S6 as sinks).

The reference pulls bytes through caller-supplied ``src``/``dst``
callbacks (jsone.ml:189, 683); the Ray-native restatement is Dataset
sources/sinks:

- ``read_geojson_files``  — one document per ``.geojson``/``.json``
  file (ray.data.read_binary_files + transport decode S4);
- ``read_geojson_lines``  — newline-delimited GeoJSON (one doc per
  line, ray.data.read_text);
- ``write_geojson``       — canonical minified serialization back to
  text, partitioned (one part file per block; resumable layout).

Oversized documents: a multi-GB FeatureCollection read here stays ONE
text row, but the parse stage splits it incrementally (T7,
stages/parse_stage.GIANT_DOC_BYTES → core/stream_split.py) so the DOM
— the ~10× blow-up — never materializes whole in a worker.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.jsontext import decode_transport


def read_geojson_files(paths):
    """Dataset(path, doc_text) — one row per file, BOM/UTF-16 handled
    by the transport decoder (uutfe semantics, jsontext.py)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        texts = [decode_transport(bytes(b)) for b in batch["bytes"].to_pylist()]
        return pa.table(
            {
                "path": batch["path"],
                "cand_text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


def read_geojson_lines(paths):
    """Dataset(cand_text) — one row per non-empty line (NDJSON-style)."""
    import ray.data as rd

    ds = rd.read_text(paths)

    def rename(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        keep = pa.compute.greater(pa.compute.utf8_length(col), 0)
        return pa.table({"cand_text": col.filter(keep)})

    return ds.map_batches(rename, batch_format="pyarrow")


def write_geojson(ds, out_dir: str, doc_col: str = "cand_text",
                  encoding: str = "utf-8", bom: bool = False) -> None:
    """Serialize the document column back to newline-delimited GeoJSON
    text files (canonical minified bytes), one part per block.

    ``encoding``/``bom`` select the transport encoding (S6 encoder
    side, uutfe parity: utf-8 / utf-16-be / utf-16-le via
    jsontext.encode_transport; the BOM — written once per file — is
    opt-in, matching the reference encoder which never emits one on
    its own). ``read_geojson_files`` round-trips every combination."""
    import os
    import uuid

    from ..core.jsontext import encode_transport

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.geojsonl")
        with open(name, "wb") as fh:
            first = True
            for d in batch[doc_col].to_pylist():
                fh.write(encode_transport(d + "\n", encoding,
                                          bom=bom and first))
                first = False
        return pa.table({"file": pa.array([name]), "rows": pa.array([len(batch)])})

    # consume: one manifest row per written part
    return ds.map_batches(write_block, batch_format="pyarrow").materialize()
