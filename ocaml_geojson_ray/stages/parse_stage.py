"""Batch GeoJSON parse/validate with verdict columns (SURVEY.md §2.1 P1-P8).

One input row per mined candidate → one output row per FEATURE
(FeatureCollections are exploded immediately — SURVEY.md §7 hard part
(f) — so giant documents never make giant rows). Failed documents keep
one row with ok=False and the reference-exact error string + channel
flag (errors-as-data, mirroring the ``result`` type at
geojson_intf.ml:282-284).

Flat columns carry the hot path: geometry envelope (minx..maxy) and
Point lng/lat, so spatial stages never re-parse JSON.
"""

from __future__ import annotations

import math
import pyarrow as pa

from ..core.jsontext import dumps_json
from ..core.model import Feature, FeatureCollection, Geometry
from ..core.parse import parse_text_recovering
from ..core.serialize import geometry_to_text

# bump when PARSED_SCHEMA, mining, or parse semantics change → derived
# caches (queries._parsed_for) re-materialize
PARSE_VERSION = 3

PARSED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("cand_idx", pa.int32()),
        ("feat_idx", pa.int32()),
        ("ok", pa.bool_()),
        ("error", pa.string()),
        ("raised", pa.bool_()),
        # recovered=True: the document only parsed after the streaming
        # lexer's U+FFFD error recovery (jsone.ml:327-420 branches;
        # core/jsontext.recover_json_text)
        ("recovered", pa.bool_()),
        # error RANGE for malformed-JSON verdicts, mirroring the
        # reference's Err.t ((l1,c1),(l2,c2)) (geojsone.ml:27-37):
        # start = the decoder's reported position; end = the last char
        # before the next value separator, the span discard_to would
        # consume (jsone.ml:487-493). 1-based lines and columns.
        ("error_line", pa.int32()),
        ("error_col", pa.int32()),
        ("error_line_end", pa.int32()),
        ("error_col_end", pa.int32()),
        ("doc_kind", pa.string()),
        ("geom_type", pa.string()),
        ("geometry_json", pa.string()),
        ("properties_json", pa.string()),
        ("foreign_members_json", pa.string()),
        ("id_str", pa.string()),
        ("id_num", pa.float64()),
        ("bbox", pa.list_(pa.float64())),
        ("lng", pa.float64()),
        ("lat", pa.float64()),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
    ]
)


def _envelope(g: Geometry):
    """(minx, miny, maxx, maxy) over all positions, or None if empty.

    The parser guarantees uniform nesting per geometry type, so the
    nest is flattened level-by-level (list comps, C-speed) and the
    extremes come from builtin min/max over the position lists — the
    round-2 per-element recursion was ~15% of the parse stage."""
    if g.type == "GeometryCollection":
        minx = miny = math.inf
        maxx = maxy = -math.inf
        for c in g.geometries or []:
            e = _envelope(c)
            if e:
                minx = min(minx, e[0])
                miny = min(miny, e[1])
                maxx = max(maxx, e[2])
                maxy = max(maxy, e[3])
        return None if minx is math.inf else (minx, miny, maxx, maxy)
    level = g.coordinates
    if not level:
        return None
    if isinstance(level[0], (int, float)):  # Point: one position
        return (level[0], level[1], level[0], level[1])
    # flatten to the position level
    while level and level[0] and not isinstance(level[0][0], (int, float)):
        level = [p for sub in level for p in sub]
    if not level:
        return None
    xs = [p[0] for p in level]
    ys = [p[1] for p in level]
    return (min(xs), min(ys), max(xs), max(ys))


class _Rows:
    __slots__ = ("cols",)

    def __init__(self):
        self.cols = {name: [] for name in PARSED_SCHEMA.names}

    def add(self, **kw):
        for name in self.cols:
            self.cols[name].append(kw.get(name))

    def table(self) -> pa.Table:
        return pa.table(
            {n: pa.array(v, PARSED_SCHEMA.field(n).type) for n, v in self.cols.items()}
        )


_SEPARATORS = frozenset(",]}")


def error_range(doc: str, pos: int, line: int, col: int):
    """((l1,c1),(l2,c2)) for an error at char offset ``pos``: the end is
    the last char before the next value separator / EOI — the exact
    span the reference's ``discard_to`` consumes while recovering
    (jsone.ml:487-493: spos at the error, epos per discarded char)."""
    n = len(doc)
    end = pos
    while end < n and doc[end] not in _SEPARATORS:
        end += 1
    end = max(pos, end - 1)
    seg = doc[pos : end + 1]
    nl = seg.count("\n")
    if nl:
        l2 = line + nl
        c2 = len(seg) - seg.rfind("\n") - 1
    else:
        l2 = line
        c2 = col + max(0, len(seg) - 1)
    return line, col, l2, c2


def _feature_row(rows, base, feat_idx: int, f: Feature, doc_kind: str, bbox):
    g = f.geometry
    env = _envelope(g) if g is not None else None
    lng = lat = None
    if g is not None and g.type == "Point" and len(g.coordinates) >= 2:
        lng, lat = g.coordinates[0], g.coordinates[1]
    fid = f.id
    rows.add(
        **base,
        feat_idx=feat_idx,
        ok=True,
        doc_kind=doc_kind,
        raised=False,
        geom_type=g.type if g is not None else None,
        geometry_json=geometry_to_text(g) if g is not None else None,
        properties_json=(
            dumps_json(f.properties) if f.properties_present else None
        ),
        foreign_members_json=dumps_json(f.foreign_members) if f.foreign_members else None,
        id_str=fid if isinstance(fid, str) else None,
        id_num=fid if isinstance(fid, float) else None,
        bbox=list(bbox) if bbox is not None else None,
        lng=lng,
        lat=lat,
        minx=env[0] if env else None,
        miny=env[1] if env else None,
        maxx=env[2] if env else None,
        maxy=env[3] if env else None,
    )


# documents above this size take the incremental splitter (T7,
# geojsone.ml:68-116): per-feature parse bounds peak memory at
# O(one feature's DOM), not O(whole-collection DOM ≈ 10× text size)
GIANT_DOC_BYTES = 4 << 20


def _parse_giant_collection(rows, base, doc: str) -> bool:
    """Bounded-memory parse of one oversized FeatureCollection: stream-
    split the top-level features array (core/stream_split.py), parse
    the small meta doc for bbox/kind, then each feature text on its
    own, emitting rows as we go. → False (with rows rolled back) if the
    doc isn't a cleanly-splittable FC — caller falls back to the
    whole-doc path so verdict semantics never diverge."""
    from ..core.stream_split import NotACollection, iter_features_text

    mark = len(rows.cols["url"])

    def rollback() -> bool:
        for col in rows.cols.values():
            del col[mark:]
        return False

    try:
        feat_idx = 0
        meta_seen = False
        # meta arrives LAST from the splitter (rows stream before it);
        # bbox / meta-level recovery are per-doc constants, so patch
        # the already-emitted row indices once meta parses
        patch_rows = []
        meta_bbox = None
        any_rec = False
        for kind, text in iter_features_text([doc]):
            if kind == "feature":
                fobj, ferr, fraised, frec = parse_text_recovering(text)
                if fobj is None or not isinstance(fobj.value, Feature):
                    return rollback()
                any_rec = any_rec or frec
                b = dict(base)
                b["recovered"] = False  # patched below, per-DOC
                patch_rows.append(len(rows.cols["url"]))
                _feature_row(rows, b, feat_idx, fobj.value,
                             "FeatureCollection", None)
                feat_idx += 1
            else:
                mobj, merr, mraised, mrec = parse_text_recovering(text)
                if mobj is None or not isinstance(mobj.value, FeatureCollection):
                    return rollback()
                # the splitter spliced "features": [] — a NON-empty list
                # here means a shadowing duplicate key survived (in any
                # escape spelling) and json.loads of the original doc
                # would keep THAT array, not the one we split: bail
                if mobj.value.features:
                    return rollback()
                meta_seen = True
                any_rec = any_rec or mrec
                meta_bbox = list(mobj.bbox) if mobj.bbox is not None else None
                if meta_bbox is not None:
                    for r in patch_rows:
                        rows.cols["bbox"][r] = meta_bbox
        if not meta_seen:
            return rollback()
        # recovered is a PER-DOCUMENT flag (whole-doc path repairs the
        # document once and marks every row) — same here
        if any_rec:
            for r in patch_rows:
                rows.cols["recovered"][r] = True
        if feat_idx == 0:
            rows.add(**base, feat_idx=-1, ok=True, raised=False,
                     recovered=any_rec, doc_kind="FeatureCollection",
                     bbox=meta_bbox)
        return True
    except (NotACollection, RecursionError):
        return rollback()


def parse_candidates_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: mined candidates → exploded parsed features."""
    rows = _Rows()
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].to_pylist()
    langs = batch["lang"].to_pylist()
    cidx = batch["cand_idx"].to_pylist()
    docs = batch["cand_text"].to_pylist()
    import re as _re

    loc_re = _re.compile(r"line (\d+) column (\d+)(?: \(char (\d+)\))?")
    for i, doc in enumerate(docs):
        base = dict(url=urls[i], warc_ts=tss[i], lang=langs[i], cand_idx=cidx[i])
        if len(doc) > GIANT_DOC_BYTES and '"features"' in doc[:GIANT_DOC_BYTES]:
            if _parse_giant_collection(rows, base, doc):
                continue  # bounded-memory path emitted the rows
        obj, err, raised, recovered = parse_text_recovering(doc)
        if obj is None:
            m = loc_re.search(err) if err else None
            l1 = c1 = l2 = c2 = None
            if m:
                l1, c1 = int(m.group(1)), int(m.group(2))
                if m.group(3) is not None:
                    l1, c1, l2, c2 = error_range(doc, int(m.group(3)), l1, c1)
            rows.add(
                **base,
                feat_idx=0,
                ok=False,
                error=err,
                raised=raised,
                recovered=False,
                error_line=l1,
                error_col=c1,
                error_line_end=l2,
                error_col_end=c2,
            )
            continue
        base["recovered"] = recovered
        v = obj.value
        if isinstance(v, FeatureCollection):
            for j, f in enumerate(v.features):
                _feature_row(rows, base, j, f, "FeatureCollection", obj.bbox)
            if not v.features:
                rows.add(**base, feat_idx=-1, ok=True, raised=False,
                         doc_kind="FeatureCollection",
                         bbox=list(obj.bbox) if obj.bbox else None)
        elif isinstance(v, Feature):
            _feature_row(rows, base, 0, f=v, doc_kind="Feature", bbox=obj.bbox)
        else:  # bare Geometry
            env = _envelope(v)
            lng = lat = None
            if v.type == "Point" and len(v.coordinates) >= 2:
                lng, lat = v.coordinates[0], v.coordinates[1]
            rows.add(
                **base,
                feat_idx=0,
                ok=True,
                raised=False,
                doc_kind="Geometry",
                geom_type=v.type,
                geometry_json=geometry_to_text(v),
                foreign_members_json=dumps_json(v.foreign_members)
                if v.foreign_members
                else None,
                bbox=list(obj.bbox) if obj.bbox else None,
                lng=lng,
                lat=lat,
                minx=env[0] if env else None,
                miny=env[1] if env else None,
                maxx=env[2] if env else None,
                maxy=env[3] if env else None,
            )
    return rows.table()
