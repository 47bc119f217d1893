"""Driver-gate rehearsal: every SQL-checked queries() entry matches its
DuckDB oracle at sf0.001 (the full-size gate runs at sf0.01 via
scripts/check_oracle.py)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as E

    return E


def _pairs():
    import __ray_entry__ as E

    return sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(name, contract, oracle_con, ray_session):
    from scripts.check_oracle import compare, to_pandas

    ray_df = to_pandas(contract.queries()[name](SF))
    sql_df = oracle_con.execute(contract.oracle_sql()[name]).df()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems


def test_entry_smoke(contract, ray_session):
    out = contract.entry()
    from scripts.check_oracle import to_pandas

    df = to_pandas(out)
    assert len(df) >= 0
    assert "n" in df.columns


def _rows_only():
    import __ray_entry__ as E

    return sorted(set(E.queries()) - set(E.oracle_sql()))


# Rows-only queries the sf0.001 fixture GUARANTEES produce rows (the
# corpus plants image/audio payloads, ≥64 embeddings, and near-dup
# pairs by construction) — pinned non-empty so a regression can't
# silently return an empty frame. The rest may be legitimately empty
# at tiny sf (emptiness is data there).
_NONEMPTY_ROWS_ONLY = {
    "multimodal_features", "multimodal_audio", "ivf_ann",
    "embedding_neardups", "semdedup", "pq_ann", "streaming_dedup",
}


@pytest.mark.parametrize("name", _rows_only())
def test_rows_only_queries_run(name, contract, ray_session):
    """EVERY rows-only entry must run at sf0.001 (the driver runs the
    whole registry; self-checking queries assert their invariants
    inside this call). Queries whose fixture guarantees output are
    additionally pinned non-empty via _NONEMPTY_ROWS_ONLY."""
    from scripts.check_oracle import to_pandas

    df = to_pandas(contract.queries()[name](SF))
    if name in _NONEMPTY_ROWS_ONLY:
        assert len(df) > 0, f"{name}: fixture-guaranteed rows came back empty"


def test_ntile_formula_matches_duckdb_property():
    """The engine's ntile size rule (first n%k buckets get ceil(n/k))
    pinned against live DuckDB for every n in 1..40, k in 2..6 — the
    formula is replicated arithmetic, so pin it property-style rather
    than trusting one fixture shape."""
    import duckdb
    import numpy as np

    from ocaml_geojson_ray.pipelines.queries import ntile_buckets

    con = duckdb.connect()
    for k in (2, 3, 4, 5, 6):
        for n in range(1, 41):
            rows = con.execute(
                f"SELECT CAST(ntile({k}) OVER (ORDER BY i) AS BIGINT) "
                f"FROM generate_series(1, {n}) t(i) ORDER BY i"
            ).fetchall()
            duck = [r[0] for r in rows]
            assert ntile_buckets(n, k).tolist() == duck, (n, k)
