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


@pytest.mark.parametrize("name", _rows_only())
def test_rows_only_queries_run(name, contract, ray_session):
    """EVERY rows-only entry must run at sf0.001 (the driver runs the
    whole registry; self-checking queries assert their invariants
    inside this call). Genuinely-empty-at-tiny-sf results are allowed
    — emptiness is data, a raise is a bug."""
    from scripts.check_oracle import to_pandas

    df = to_pandas(contract.queries()[name](SF))
    assert len(df) >= 0, name
