"""Crash-safety fuzzing: the errors-as-data contract means NO input may
raise out of parse_text / of_json_result / find_candidates — a raised
exception inside a map_batches UDF kills the Ray task."""

from hypothesis import given, settings, strategies as st

from ocaml_geojson_ray.core.parse import of_json_result, parse_text
from ocaml_geojson_ray.stages.mine import find_candidates

json_value = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(10**12), max_value=10**12),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=12),
    ),
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(
            st.sampled_from(
                ["type", "coordinates", "geometry", "geometries", "features",
                 "properties", "id", "bbox", "x"]
            ),
            inner,
            max_size=6,
        ),
    ),
    max_leaves=25,
)


@settings(max_examples=400, deadline=None)
@given(json_value)
def test_of_json_result_never_raises(value):
    obj, err, raised = of_json_result(value)
    assert (obj is None) != (err is None)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_parse_text_never_raises(text):
    obj, err, raised = parse_text(text)
    assert (obj is None) != (err is None)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_find_candidates_never_raises(text):
    for start, end, doc in find_candidates(text):
        assert text[start:end] == doc


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_parse_text_recovering_never_raises(text):
    from ocaml_geojson_ray.core.parse import parse_text_recovering

    obj, err, raised, recovered = parse_text_recovering(text)
    assert (obj is None) != (err is None)
    if recovered:
        assert obj is not None  # recovered implies a successful parse


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet='{}[]"\\qu0123456789abcdef \n,:', max_size=150))
def test_recover_json_text_never_raises(text):
    """The recovery scanner must terminate and return a string for ANY
    input, including pathological escape/surrogate soups."""
    from ocaml_geojson_ray.core.jsontext import recover_json_text

    out = recover_json_text(text)
    assert isinstance(out, str)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet='{}[]"\\abc,: \n', max_size=200))
def test_stream_split_never_raises(text):
    """iter_features_text either splits or raises NotACollection —
    nothing else — for arbitrary brace soup."""
    from ocaml_geojson_ray.core.stream_split import (
        NotACollection,
        iter_features_text,
    )

    try:
        for kind, _t in iter_features_text([text]):
            assert kind in ("feature", "meta")
    except NotACollection:
        pass


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=250))
def test_parse_candidates_batch_never_raises(text):
    """The full batch UDF (mining verdict semantics incl. recovery,
    ranges, giant-doc dispatch) over arbitrary candidate text."""
    import pyarrow as pa

    from ocaml_geojson_ray.stages.parse_stage import parse_candidates_batch

    batch = pa.table({
        "url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
        "lang": ["en"], "cand_idx": pa.array([0], pa.int32()),
        "cand_text": [text],
    })
    out = parse_candidates_batch(batch)
    assert len(out) >= 1


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["type", "a", "b", "features", "x,y"]),
            st.recursive(
                st.one_of(st.none(), st.integers(-5, 5),
                          st.text(alphabet='ab{}[]",\\: ', max_size=8)),
                lambda inner: st.one_of(st.lists(inner, max_size=3),
                                        st.dictionaries(st.text(max_size=3),
                                                        inner, max_size=3)),
                max_leaves=6,
            ),
            max_size=4,
        ),
        max_size=5,
    ),
    st.dictionaries(st.sampled_from(["bbox", "meta", "t"]),
                    st.integers(-9, 9), max_size=3),
)
def test_stream_split_agrees_with_json_loads(features, extra):
    """PROPERTY: for any valid FC json (object elements only), the
    splitter's feature texts parse to exactly json.loads(doc)
    ['features'], and the meta doc is the document with features
    emptied."""
    import json

    from ocaml_geojson_ray.core.stream_split import split_collection_text

    doc_obj = {"type": "FeatureCollection", **extra, "features": features}
    doc = json.dumps(doc_obj)
    feats, meta = split_collection_text(doc)
    assert [json.loads(f) for f in feats] == features
    want_meta = dict(doc_obj)
    want_meta["features"] = []
    assert json.loads(meta) == want_meta


_ENT_TOKENS = st.sampled_from(
    ["&amp;", "&lt;", "&gt;", "&quot;", "&#x27;", "&", "&x;", "a", " ",
     "&#38;", "&#39;", "&amp", ";", "&Aacute;", "&unknown;", "text"]
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_ENT_TOKENS, max_size=12).map("".join))
def test_fast_unescape_equals_html_unescape(s):
    """extract._unescape_block must be byte-equivalent to html.unescape
    on any input (the guarded fast path may never diverge)."""
    import html

    from ocaml_geojson_ray.stages.extract import _unescape_block

    assert _unescape_block(s) == html.unescape(s)


@settings(max_examples=400, deadline=None)
@given(st.one_of(
    st.none(),
    st.text(max_size=40),
    st.text(alphabet='{}[]":,0123456789.eEk+- ', max_size=40),
    st.floats(allow_nan=True, allow_infinity=True).map(
        lambda f: '{"k": %r}' % f),
    st.integers().map(lambda i: '{"k": %d}' % i),
))
def test_extract_json_int_k_never_raises(p):
    """The json_props_stats gate is errors-as-data for ANY props value:
    None, arbitrary text, JSON-ish fragments, huge/inf/nan numbers —
    no input may raise out of the gate, and every kept value is an
    int64-safe integer within the DOUBLE-exact ±2^53 domain."""
    from ocaml_geojson_ray.pipelines.queries import extract_json_int_k

    idx, ks = extract_json_int_k([p])
    assert len(idx) == len(ks) <= 1
    for k in ks.tolist():
        assert abs(k) <= 9007199254740992
