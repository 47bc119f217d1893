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


def test_md5_le64_device_pinned():
    """The consolidated md5-LE-64 device (util.md5_le64) is load-bearing
    for four oracles (winnowing, simhash, HLL fallback, hash sampling):
    pin it against constants AND against live DuckDB's
    '0x'||substr(...) UBIGINT reinterpretation so a refactor can't
    silently change byte order or truncation width."""
    import duckdb

    from ocaml_geojson_ray.util import md5_le64

    # hand-derivable constant: md5("0") = cfcd208495d565ef66e7dff9f98764da
    # → first 8 bytes little-endian = 0xef65d59584 20cdcf
    assert md5_le64(b"0") == 0xEF65D5958420CDCF

    con = duckdb.connect()
    for s in ["0", "1", "42", "hello world", "a b c"]:
        sql = con.execute(
            "WITH g AS (SELECT md5(?) AS hx) "
            "SELECT CAST('0x' || substr(hx,15,2) || substr(hx,13,2)"
            " || substr(hx,11,2) || substr(hx,9,2) || substr(hx,7,2)"
            " || substr(hx,5,2) || substr(hx,3,2) || substr(hx,1,2)"
            " AS UBIGINT) FROM g", [s]
        ).fetchone()[0]
        assert md5_le64(s.encode("utf-8")) == sql, s


def test_inverted_index_vocab_cap_and_tiebreak(tmp_path, ray_session):
    """The sf fixtures have only 31 distinct terms, so the top-50-df
    vocab LIMIT and its (df DESC, term ASC) rank-50 tie-break never
    bind there — pin them on a synthetic 55-term corpus with a df tie
    straddling the boundary (10 terms at df=7 competing for 5 slots)
    and a df=60 term exercising the 20-id posting cap, value-compared
    against the same DuckDB oracle on the same parquet."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from scripts.check_oracle import compare, to_pandas

    n_docs = 60
    # term -> df; assignment = first df docs contain the term
    tdf = {"aaa": 60}                         # rank 1; postings capped at 20
    tdf.update({f"w{i:02d}": 59 - i for i in range(44)})   # ranks 2-45
    tdf.update({f"tie_{c}": 7 for c in "abcdefghij"})      # ranks 46-55 tie
    texts = [" ".join(t for t, df in tdf.items() if d < df)
             for d in range(n_docs)]
    tbl = pa.table({
        "doc_id": pa.array(range(1, n_docs + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    ray_df = to_pandas(E.queries()["inverted_index"](str(tmp_path)))
    assert len(ray_df) == 50
    terms = set(ray_df["term"])
    # tie group: term-ASC picks a..e, drops f..j
    assert {"tie_a", "tie_b", "tie_c", "tie_d", "tie_e"} <= terms
    assert not terms & {"tie_f", "tie_g", "tie_h", "tie_i", "tie_j"}
    cap_row = ray_df[ray_df["term"] == "aaa"].iloc[0]
    assert cap_row["df"] == 60
    assert cap_row["postings"] == ",".join(str(i) for i in range(1, 21))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')")
    sql_df = con.execute(E.oracle_sql()["inverted_index"]).df()
    problems = compare("inverted_index_synth", ray_df, sql_df)
    assert not problems, problems


def test_cooccur_pairs_explosion_kernel(tmp_path, ray_session):
    """The sf fixtures' orders are ≤13 lines with rare within-order
    part repeats, so the two sharp edges of the vectorized pair
    explosion barely bind there — pin them on a synthetic lineitem:
    (a) a part repeated on several lines of ONE order must count that
    order once (support counts orders, not line pairs), (b) a 9-wide
    order exercises the offset-k scan to k=8, (c) a deliberate support
    tie at the min-support boundary. Brute-forced with itertools AND
    value-compared against the DuckDB oracle on the same parquet."""
    import itertools

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from scripts.check_oracle import compare, to_pandas

    orders = {
        1: [10, 20, 10, 30, 10],        # dup part 10 → pairs counted once
        2: [10, 20, 30],
        3: list(range(100, 109)),       # 9-wide order: k runs to 8
        4: [100, 101, 105],
        5: [20, 10],                    # (10,20) reaches support 3
        6: [40],                        # singleton order: no pairs
        7: [50, 50],                    # dup-only order: no pairs
    }
    ok_, pk = [], []
    for o, parts in orders.items():
        for p in parts:
            ok_.append(o)
            pk.append(p)
    tbl = pa.table({
        "l_orderkey": pa.array(ok_, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))

    ray_df = to_pandas(E.queries()["cooccur_pairs"](str(tmp_path)))

    support = {}
    for parts in orders.values():
        for a, b in itertools.combinations(sorted(set(parts)), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    want = sorted(
        ((p1, p2, n) for (p1, p2), n in support.items() if n >= 2),
        key=lambda r: (-r[2], r[0], r[1]))[:100]
    got = list(ray_df[["p1", "p2", "n_orders"]].itertuples(index=False,
                                                           name=None))
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet')")
    sql_df = con.execute(E.oracle_sql()["cooccur_pairs"]).df()
    problems = compare("cooccur_pairs_synth", ray_df, sql_df)
    assert not problems, problems


def test_lev_block_matches_duckdb_property():
    """The vectorized Wagner-Fischer kernel (_lev_block) is replicated
    arithmetic for DuckDB's levenshtein() — pin it property-style on
    ~300 deterministic random pairs inside the |len diff| ≤ 2 band the
    caller guarantees (lengths 1..12, incl. equal strings, shared
    prefixes/suffixes and transpositions, which cost 2 here — this is
    Levenshtein, NOT Damerau)."""
    import duckdb
    import numpy as np

    from ocaml_geojson_ray.pipelines.queries import _lev_block

    rng = np.random.default_rng(20260818)
    alpha = np.array(list("abcde_0"))
    a_words, b_words = [], []
    while len(a_words) < 300:
        la = int(rng.integers(1, 13))
        lb = int(rng.integers(max(1, la - 2), min(12, la + 2) + 1))
        a = "".join(rng.choice(alpha, la))
        if rng.random() < 0.2:
            b = a  # equal strings → dist 0
        elif rng.random() < 0.3 and la >= 2:
            b = a[1] + a[0] + a[2:]  # transposition → dist ≤ 2
        else:
            b = "".join(rng.choice(alpha, lb))
        a_words.append(a)
        b_words.append(b)
    aw = np.asarray(a_words, dtype=object)
    bw = np.asarray(b_words, dtype=object)
    la = np.asarray([len(w) for w in a_words], np.int64)
    lb = np.asarray([len(w) for w in b_words], np.int64)
    got = _lev_block(aw, bw, la, lb)

    con = duckdb.connect()
    for i in range(len(a_words)):
        want = con.execute("SELECT levenshtein(?, ?)",
                           [a_words[i], b_words[i]]).fetchone()[0]
        assert got[i] == want, (a_words[i], b_words[i], got[i], want)


def test_quantile_cont_formula_matches_duckdb_property():
    """percentile_cont_qty replicates DuckDB's quantile_cont
    arithmetic: rn = (n−1)·q, result = s[lo]·(1−frac) + s[hi]·frac.
    The op ORDER matters — s[lo] + (s[hi]−s[lo])·frac is algebraically
    equal but rounds differently (a real mismatch surfaced at
    q=0.33). Pin the exact form against live DuckDB on 200 random
    histograms including duplicate values and q ∈ {0, 1}."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    rng = np.random.default_rng(20260818)
    for trial in range(200):
        n = int(rng.integers(1, 60))
        vals = (np.round(rng.uniform(0, 500, n) * 100) / 100.0)
        if trial % 3 == 0 and n > 4:
            vals[: n // 2] = vals[0]  # duplicate-heavy histograms
        q = float(rng.choice([0.0, 0.25, 0.33, 0.5, 0.75, 0.9, 1.0]))
        con.execute(
            "CREATE OR REPLACE TABLE t AS SELECT unnest(?) AS x",
            [vals.tolist()])
        want = con.execute(
            f"SELECT quantile_cont(x, {q}) FROM t").fetchone()[0]
        s = np.sort(vals)
        rn = (n - 1) * q
        lo = int(np.floor(rn))
        hi = int(np.ceil(rn))
        frac = rn - lo
        mine = s[lo] * (1 - frac) + s[hi] * frac
        assert mine == want, (trial, n, q, mine, want)


def test_interval_coverage_negative_values_parity(tmp_path, ray_session):
    """The fixture's event values are all positive, so the duration
    modulo's sign convention never binds there — pin it on a synthetic
    events table with NEGATIVE values (numpy % is sign-of-divisor;
    the oracle forces the same nonneg residue with ((x%600)+600)%600 —
    a bare DuckDB % would make negative-duration intervals)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from scripts.check_oracle import compare, to_pandas

    n = 40
    ts = pa.array(
        [1_700_000_000_000_000 + i * 137_000_000 for i in range(n)],
        pa.timestamp("us"))
    vals = [(-1.23, 0.0, -599.99, 599.99, 5.0)[i % 5] for i in range(n)]
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": ts,
        "user_id": pa.array([i % 4 for i in range(n)], pa.int64()),
        "event_type": pa.array(["view"] * n, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    ray_df = to_pandas(E.queries()["interval_coverage"](str(tmp_path)))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    sql_df = con.execute(E.oracle_sql()["interval_coverage"]).df()
    problems = compare("interval_coverage_negative", ray_df, sql_df)
    assert not problems, problems
