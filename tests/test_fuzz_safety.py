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
