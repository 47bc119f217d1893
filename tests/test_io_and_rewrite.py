"""Ray-level IO sources/sinks and rewrite/fold/iter stages."""

import pathlib

import pyarrow as pa
import pytest

from ocaml_geojson_ray.functions.streaming import capitalise_nom, remove_all_coords

FIX = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    docs = [
        (FIX / "simple.geojson").read_text().strip(),
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},'
        '"properties":{"nom":"paris"}}',
    ]
    return rd.from_arrow(pa.table({"cand_text": pa.array(docs, pa.string())}))


def test_read_geojson_files(ray_session, tmp_path):
    from ocaml_geojson_ray.sources.geojson_files import read_geojson_files

    (tmp_path / "a.geojson").write_text('{"type":"Point","coordinates":[1,2]}')
    # UTF-16 with BOM: transport decode must handle it (S4)
    (tmp_path / "b.geojson").write_bytes(
        '{"type":"Point","coordinates":[3,4]}'.encode("utf-16")
    )
    ds = read_geojson_files(str(tmp_path))
    rows = {pathlib.Path(r["path"]).name: r["cand_text"] for r in ds.take_all()}
    assert rows["a.geojson"] == '{"type":"Point","coordinates":[1,2]}'
    assert rows["b.geojson"] == '{"type":"Point","coordinates":[3,4]}'


def test_lines_roundtrip_write(ray_session, tmp_path, docs_ds):
    from ocaml_geojson_ray.sources.geojson_files import (
        read_geojson_lines,
        write_geojson,
    )

    out = tmp_path / "out"
    manifest = write_geojson(docs_ds, str(out))
    assert sum(r["rows"] for r in manifest.take_all()) == 2
    back = read_geojson_lines(str(out))
    assert sorted(r["cand_text"] for r in back.take_all()) == sorted(
        r["cand_text"] for r in docs_ds.take_all()
    )


def test_encode_transport_goldens():
    """Encoder side of uutfe (uutfe.ml:1040+): UTF-16 byte-exact
    goldens incl. a surrogate pair, BOM opt-in, and decode round-trip
    of all six (encoding × bom) forms."""
    from ocaml_geojson_ray.core.jsontext import (
        decode_transport, encode_transport)

    s = '{"name":"café \U0001f600"}'
    # golden bytes: é = 00E9, 😀 = surrogate pair D83D DE00
    le = encode_transport(s, "utf-16-le")
    assert le[:2] == b'{\x00' and b"\xe9\x00" in le
    assert b"\x3d\xd8\x00\xde" in le  # LE surrogate pair
    be = encode_transport(s, "utf-16-be")
    assert be[:2] == b'\x00{' and b"\xd8\x3d\xde\x00" in be
    assert encode_transport(s, "utf-16-le", bom=True)[:2] == b"\xff\xfe"
    assert encode_transport(s, "utf-16-be", bom=True)[:2] == b"\xfe\xff"
    assert encode_transport(s, "utf-8", bom=True)[:3] == b"\xef\xbb\xbf"
    for enc in ("utf-8", "utf-16-be", "utf-16-le"):
        for bom in (False, True):
            assert decode_transport(encode_transport(s, enc, bom)) == s
    with pytest.raises(ValueError):
        encode_transport(s, "latin-1")


def test_write_geojson_utf16_roundtrip(ray_session, tmp_path, docs_ds):
    """S6 encoder parity at the sink: UTF-16LE + BOM output files read
    back byte-for-text-identical through the S4 transport decoder."""
    from ocaml_geojson_ray.sources.geojson_files import (
        read_geojson_files, write_geojson)

    out = tmp_path / "out16"
    manifest = write_geojson(docs_ds, str(out), encoding="utf-16-le",
                             bom=True)
    assert sum(r["rows"] for r in manifest.take_all()) == 2
    # every part decodes via BOM sniffing; lines reassemble the docs
    got = []
    for r in read_geojson_files(str(out)).take_all():
        got.extend(x for x in r["cand_text"].split("\n") if x)
    assert sorted(got) == sorted(
        r["cand_text"] for r in docs_ds.take_all())


def test_map_props_stage(ray_session, docs_ds):
    from ocaml_geojson_ray.stages.rewrite import MapProps

    out = docs_ds.map_batches(
        MapProps(capitalise_nom), batch_format="pyarrow"
    ).take_all()
    assert all(r["rewrite_error"] is None for r in out)
    joined = " ".join(r["cand_text"] for r in out)
    assert '"nom":"FOIX"' in joined and '"nom":"PARIS"' in joined


def test_map_geometry_stage(ray_session, docs_ds):
    from ocaml_geojson_ray.stages.rewrite import MapGeometry

    out = docs_ds.map_batches(
        MapGeometry(remove_all_coords), batch_format="pyarrow"
    ).take_all()
    assert all(r["rewrite_error"] is None for r in out)
    big = next(r for r in out if "FeatureCollection" in r["cand_text"])
    assert '"coordinates":[]' in big["cand_text"]


def test_map_geometry_stage_error_as_data(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.stages.rewrite import MapGeometry

    bad = '{"type":"Feature","geometry":{"type":"Nope"},"properties":null}'
    ds = rd.from_arrow(pa.table({"cand_text": pa.array([bad], pa.string())}))
    out = ds.map_batches(MapGeometry(remove_all_coords),
                         batch_format="pyarrow").take_all()
    assert "Unknown type of geometry Nope" in out[0]["rewrite_error"]
    assert out[0]["cand_text"] == bad  # untouched on error


def test_fold_and_iter(ray_session, docs_ds):
    from ocaml_geojson_ray.stages.rewrite import (
        fold_geometry,
        fold_props,
        iter_geometry,
        iter_props,
    )

    noms = fold_props(
        docs_ds,
        lambda acc, p: acc | ({p["nom"]} if isinstance(p, dict) and "nom" in p else set()),
        set(),
        lambda a, b: a | b,
    )
    assert noms == {"Foix", "paris"}

    n_geoms = fold_geometry(
        docs_ds, lambda acc, g: acc + 1, 0, lambda a, b: a + b
    )
    assert n_geoms == 2

    seen = []
    iter_geometry(docs_ds, lambda obj: seen.append(obj.value.type))
    assert sorted(seen) == ["Point", "Polygon"]
    props = []
    iter_props(docs_ds, lambda p: props.append(p.get("nom")))
    assert sorted(props) == ["Foix", "paris"]
