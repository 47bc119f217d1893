"""Stage-level tests: textstats, dedup family, ANN, multimodal
plumbing, skew utilities, checkpoint/counters."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(ray_session, texts, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def test_textstats_counts(ray_session):
    from ocaml_geojson_ray.stages.textstats import TextStats

    t = pa.table({"text": ["Hello big World 42", "", "a  b"]})
    out = TextStats()(t)
    assert out["n_tokens"].to_pylist() == [4, 0, 2]
    assert out["n_words"].to_pylist() == [4, 0, 2]
    assert out["n_chars_obs"].to_pylist() == [18, 0, 4]
    assert out["avg_word_len"].to_pylist()[0] == pytest.approx((5 + 3 + 5 + 2) / 4)


def test_langid(ray_session):
    from ocaml_geojson_ray.stages.textstats import LangId

    t = pa.table({"text": [
        "the cat and the dog sat in a corner of the room",
        "le chat et la souris sont dans la maison des amis",
        "zzz qqq www",
    ]})
    out = LangId()(t)
    assert out["lang_pred"].to_pylist() == ["en", "fr", "und"]


def test_exact_dedup(ray_session):
    from ocaml_geojson_ray.stages.dedup import exact_dedup

    ds = _docs_ds(ray_session, ["aaa", "bbb", "aaa", "ccc", "aaa"])
    rows = {r["content_md5"]: r for r in exact_dedup(ds).take_all()}
    assert len(rows) == 3
    import hashlib

    h = hashlib.md5(b"aaa").hexdigest()
    assert rows[h]["keeper_id"] == 0 and rows[h]["n_dups"] == 3


def test_minhash_lsh_finds_neardups(ray_session):
    import ray

    from ocaml_geojson_ray.stages.dedup import (
        PairVerifier,
        minhash_lsh_candidates,
    )

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest past the old stone bridge")
    near = base.replace("stone", "wooden")
    texts = [base, near, "completely different words entirely unrelated "
             "gibberish tokens forming another document altogether okay"]
    ds = _docs_ds(ray_session, texts)
    cands = minhash_lsh_candidates(ds, bands=32, rows=4)
    texts_ref = ray.put({i: t for i, t in enumerate(texts)})
    verified = cands.map_batches(
        PairVerifier, fn_constructor_args=(texts_ref,),
        fn_constructor_kwargs={"threshold": 0.5},
        batch_format="pyarrow", concurrency=1,
    ).take_all()
    pairs = {(r["a_id"], r["b_id"]) for r in verified}
    assert (0, 1) in pairs
    assert all(p in {(0, 1)} for p in pairs)


def test_minhash_plans_agree(ray_session):
    """The single-task pairing plan and the distributed self-join plan
    (and the broadcast vs join-back verify plans) produce IDENTICAL
    pair tables — forced via the size thresholds."""
    from ocaml_geojson_ray.stages.dedup import (
        minhash_lsh_candidates,
        verify_pairs_distributed,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = [base, base.replace("sigma", "SIGMA"),
             base.replace("beta", "BETA").replace("tau", "TAU"),
             "totally different content with none of those words at all "
             "just filler tokens making up a separate document body"]
    ds = _docs_ds(ray_session, texts)

    def pairset(dset):
        return sorted(
            (r["a_id"], r["b_id"], r["n_shared_bands"])
            for r in dset.take_all()
        )

    small = minhash_lsh_candidates(ds, bands=32, rows=4)
    large = minhash_lsh_candidates(ds, bands=32, rows=4,
                                   small_bands_rows=0)
    ps, pl = pairset(small), pairset(large)
    assert ps == pl and len(ps) >= 3  # the three near-dup pairs found

    def verified(pairs_ds, small_pairs):
        out = verify_pairs_distributed(
            pairs_ds, ds, threshold=0.5, small_pairs=small_pairs)
        return sorted(
            (r["a_id"], r["b_id"], round(r["jaccard"], 9))
            for r in out.take_all()
        )

    vb = verified(minhash_lsh_candidates(ds, bands=32, rows=4), 10**6)
    vj = verified(minhash_lsh_candidates(ds, bands=32, rows=4), 0)
    assert vb == vj and len(vb) >= 3


def test_simhash_dedup(ray_session):
    from ocaml_geojson_ray.stages.dedup import simhash_dedup

    ds = _docs_ds(ray_session, ["same text here", "same text here", "other"])
    rows = simhash_dedup(ds).take_all()
    dup = [r for r in rows if r["n_dups"] == 2]
    assert len(dup) == 1 and dup[0]["keeper_id"] == 0


def test_embedding_neardups(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(3)
    v = rng.standard_normal(16)
    vecs = [v, v + rng.standard_normal(16) * 0.01, rng.standard_normal(16)]
    ds = rd.from_arrow(
        pa.table({
            "vec_id": pa.array([10, 11, 12], pa.int64()),
            "embedding": pa.array([x.tolist() for x in vecs],
                                  pa.list_(pa.float64())),
        })
    )
    got = embedding_neardup_pairs(ds, threshold=0.95).take_all()
    pairs = {(r["a_id"], r["b_id"]) for r in got}
    assert (10, 11) in pairs and len(pairs) == 1


def test_hot_bucket_split_bounds_leaf_width():
    """A hot LSH bucket (spread vectors) splits to ≤ cap leaves; an
    identical-vector mass is honestly unsplittable (single leaf) and
    the chunked leaf kernel still returns every pair without an O(b²)
    sim matrix."""
    from ocaml_geojson_ray.stages.dedup import (
        _neardup_leaf_pairs, split_oversized_bucket)

    rng = np.random.default_rng(7)
    # spread cloud: every leaf must come back under the cap
    vn = rng.standard_normal((5000, 16))
    vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    leaves = split_oversized_bucket(vn, cap=64, seed=99)
    assert sum(len(l) for l in leaves) == 5000
    assert max(len(l) for l in leaves) <= 64
    assert len(np.unique(np.concatenate(leaves))) == 5000  # partition

    # identical mass: cannot split — one oversized leaf, handled by
    # the chunked kernel (all n(n-1)/2 pairs, chunk << n)
    n = 500
    same = np.tile(vn[0], (n, 1))
    leaves = split_oversized_bucket(same, cap=64, seed=99)
    assert len(leaves) == 1 and len(leaves[0]) == n
    ai, bi, cs = _neardup_leaf_pairs(
        np.arange(n), same, threshold=0.95, chunk=64)
    assert len(ai) == n * (n - 1) // 2
    assert np.all(bi > ai) and np.allclose(cs, 1.0)


def test_embedding_neardups_hot_bucket_recall(ray_session):
    """End-to-end: a bucket far over the cap still surfaces planted
    near-identical pairs after recursive splitting (identical vectors
    always land in the same leaf)."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    # 1200 near-copies of one vector -> one mega-bucket
    vecs = base + rng.standard_normal((1200, 16)) * 1e-6
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(1200), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    }))
    got = embedding_neardup_pairs(ds, threshold=0.95,
                                  bucket_cap=128).take_all()
    # bounded work: a pair-complete clique would be 719,400 pairs; the
    # capped plan emits within-leaf pairs + rep stitches only
    assert 0 < len(got) < 200_000
    # connectivity-complete: the whole planted cluster must come out
    # as ONE component through the emitted pairs
    parent = list(range(1200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in got:
        assert r["cosine"] >= 0.95  # every emitted pair is genuine
        a, b = find(int(r["a_id"])), find(int(r["b_id"]))
        if a != b:
            parent[a] = b
    assert len({find(i) for i in range(1200)}) == 1


def test_brute_force_topk_exact(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.stages.ann import brute_force_topk

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((100, 8))
    ds = rd.from_arrow(
        pa.table({
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64())),
        })
    )
    queries = {0: vecs[0], 7: vecs[7]}
    got = brute_force_topk(ds, queries, k=5).take_all()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for qid in queries:
        want = np.argsort(-(norm @ norm[qid]))[:5]
        rows = sorted((r for r in got if r["query_id"] == qid),
                      key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == list(want), qid
        assert rows[0]["vec_id"] == qid and rows[0]["cosine"] == 1.0


def test_ivf_recall(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((300, 12))
    ds = rd.from_arrow(
        pa.table({
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64())),
        })
    )
    queries = {i: vecs[i] for i in range(5)}
    exact = brute_force_topk(ds, queries, k=10).take_all()
    approx = ivf_topk(ds, queries, k=10, n_centroids=8, nprobe=3).take_all()
    for qid in queries:
        e = {r["vec_id"] for r in exact if r["query_id"] == qid}
        a = {r["vec_id"] for r in approx if r["query_id"] == qid}
        assert len(e & a) / len(e) >= 0.5, qid  # recall floor


def test_multimodal_stub_and_fake(ray_session):
    from ocaml_geojson_ray.stages.multimodal import DecodeImage, synth_media_batch

    t = synth_media_batch(pa.table({"id": pa.array([1, 2], pa.int64())}))
    # compressed/unknown mimes stay stubbed: errors-as-data, no raise
    stub = DecodeImage()(t)
    assert all(e is not None for e in stub["decode_error"].to_pylist())
    assert all(f is None for f in stub["image_features"].to_pylist())
    out = DecodeImage(fake=True)(t)
    assert "payload" not in out.column_names  # bytes dropped ASAP
    f1 = out["image_features"].to_pylist()
    out2 = DecodeImage(fake=True)(t)
    assert f1 == out2["image_features"].to_pylist()  # deterministic


def test_codecs_roundtrip_bitexact():
    """From-scratch BMP/WAV codecs round-trip exactly (incl. the
    padded-row widths and stereo WAV)."""
    import numpy as np

    from ocaml_geojson_ray.stages.codecs import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(42)
    for h, w in ((5, 7), (16, 16), (3, 1), (10, 2)):  # odd widths → padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)
    x = rng.uniform(-0.99, 0.99, 777)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and len(y) == 777
    # PCM16 quantization: exact to 1/32768
    assert np.abs(y - x).max() <= 1.0 / 32768.0
    stereo = rng.uniform(-0.9, 0.9, (100, 2))
    y2, _ = decode_wav(encode_wav(stereo, 16000))
    assert y2.shape == (100, 2)
    with pytest.raises(ValueError):
        decode_bmp(b"nope")
    with pytest.raises(ValueError):
        decode_wav(b"nope")


def test_real_bmp_decode_features(ray_session):
    """The real BMP decode path: planted pixels → encode_bmp payload →
    DecodeImage (no fake flag) → features equal direct computation."""
    import numpy as np

    from ocaml_geojson_ray.stages.multimodal import (
        DecodeImage,
        synth_bmp_media_batch,
        synth_pixels,
    )

    t = synth_bmp_media_batch(pa.table({"id": pa.array([3, 4, 5], pa.int64())}))
    out = DecodeImage()(t)
    assert all(e is None for e in out["decode_error"].to_pylist())
    for mid, feat in zip(out["media_id"].to_pylist(),
                         out["image_features"].to_pylist()):
        img = synth_pixels(mid)
        want = np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1))])
        assert np.allclose(feat, want, rtol=0, atol=1e-12)


def test_real_wav_decode_features(ray_session):
    """The real WAV decode path: encoded tone → AudioFeatures (no fake
    flag) → RMS/ZCR/centroid equal direct computation on the decoded
    samples."""
    import numpy as np

    from ocaml_geojson_ray.stages.codecs import decode_wav
    from ocaml_geojson_ray.stages.multimodal import (
        AudioFeatures,
        synth_wav_media_batch,
    )

    t = synth_wav_media_batch(pa.table({"id": pa.array([1, 2], pa.int64())}))
    out = AudioFeatures()(t)
    assert all(e is None for e in out["decode_error"].to_pylist())
    x, _ = decode_wav(t["payload"][0].as_py())
    want = AudioFeatures._features(x)
    assert out["audio_features"].to_pylist()[0] == want
    # a genuine tone: RMS near 0.5/sqrt(2), ZCR positive
    assert 0.2 < want[0] < 0.6 and want[1] > 0.0


def test_salted_sum_equals_plain(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ocaml_geojson_ray.spatial.skew import salted_grouped_sum

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 5, size=2000)
    vals = rng.integers(0, 100, size=2000)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    )
    want = {r["k"]: r["s"] for r in
            ds.groupby("k").aggregate(Sum("v", alias_name="s")).take_all()}
    got = {r["k"]: r["sum_v"] for r in
           salted_grouped_sum(ds, ["k"], "v", k=8, alias="sum_v").take_all()}
    assert got == want


def test_detect_and_split_hot_cells(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.spatial import cells as C
    from ocaml_geojson_ray.spatial.skew import (
        detect_hot_cells,
        split_hot_cells_batch,
    )

    # 500 points in one cell, 20 spread out
    lng = np.concatenate([np.full(500, 10.1), np.linspace(-170, 170, 20)])
    lat = np.concatenate([np.full(500, 20.2), np.linspace(-60, 60, 20)])
    cell = C.latlng_to_cell(lng, lat, 5)
    t = pa.table({
        "cell": pa.array(cell, pa.int64()),
        "lng": pa.array(lng, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
    })
    ds = rd.from_arrow(t)
    hot = detect_hot_cells(ds, threshold=100)
    assert len(hot) == 1
    hot_cell = next(iter(hot))
    out = split_hot_cells_batch(t, frozenset(hot), split_levels=3)
    new_cells = out["cell"].to_numpy()
    changed = new_cells != cell
    assert changed.sum() == 500
    assert (C.cell_res(new_cells[changed]) == 8).all()
    # children still roll up to the hot parent
    assert (C.cell_to_parent(new_cells[changed], 5) == hot_cell).all()


def test_checkpoint_resume(tmp_path):
    from ocaml_geojson_ray.state.checkpoint import run_resumable

    calls = []

    def run_shard(shard, dest):
        calls.append(shard)
        (tmp_path / "side").mkdir(exist_ok=True)
        import pathlib

        pathlib.Path(dest, "data.txt").write_text(shard)
        return {"rows": 1}

    out = str(tmp_path / "out")
    first = run_resumable(["a", "b", "c"], out, run_shard)
    assert sorted(first) == ["a", "b", "c"] and calls == ["a", "b", "c"]
    second = run_resumable(["a", "b", "c", "d"], out, run_shard)
    assert sorted(second) == ["d"]  # only the new shard ran
    assert calls == ["a", "b", "c", "d"]
    import pathlib

    assert pathlib.Path(out, "part=b", "data.txt").read_text() == "b"


def test_partition_metrics(ray_session):
    from ocaml_geojson_ray.state.counters import partition_metrics_batch

    t = pa.table({
        "url": pa.array(["u1", "u1", "u2"], pa.string()),
        "ok": pa.array([True, False, True], pa.bool_()),
    })
    m = partition_metrics_batch(t).to_pylist()[0]
    assert m == {"n_rows": 3, "n_valid": 2, "n_invalid": 1, "n_pages": 2}


def test_counter_actor(ray_session):
    import ray

    from ocaml_geojson_ray.state.counters import get_counter

    c = get_counter("test_ctr")
    ray.get(c.incr.remote("x", 2))
    ray.get(c.incr_many.remote({"x": 1, "y": 5}))
    snap = ray.get(c.snapshot.remote())
    assert snap == {"x": 3, "y": 5}


def test_hll_accuracy_and_merge():
    from ocaml_geojson_ray.stages.sketches import HyperLogLog

    a = HyperLogLog(12).add_many(list(range(5000)))
    b = HyperLogLog(12).add_many(list(range(2500, 7500)))
    a.merge(b)
    assert abs(a.estimate() - 7500) / 7500 < 0.05
    c = HyperLogLog.from_bytes(a.to_bytes(), 12)
    assert c.estimate() == a.estimate()


def test_hll_estimate_sql_parity_devices():
    """Pins the two float devices SQL_HLL_DISTINCT_USERS relies on:
    (1) estimate() is a pure function of the register MULTISET — the
    denominator is accumulated as an exact integer, so shuffling the
    register array never changes the value (a float sum would);
    (2) the linear-counting branch's math.log equals DuckDB's ln
    bit-for-bit (both libm; np.log's SIMD path diverges and must NOT
    be reintroduced)."""
    import duckdb
    import numpy as np

    from ocaml_geojson_ray.stages.sketches import HyperLogLog

    rng = np.random.default_rng(42)
    # (1) order independence, on both estimator branches
    for n in (50, 5000, 200000):
        h = HyperLogLog(12).add_many(rng.integers(0, 2**62, n).tolist())
        g = HyperLogLog(12)
        g.registers = rng.permutation(h.registers)
        assert g.estimate() == h.estimate()
    # (2) libm ln parity with DuckDB for every possible zeros count
    con = duckdb.connect()
    rows = con.sql(
        "SELECT z, 4096.0 * ln(4096.0 / z) FROM range(1, 4097) t(z)"
    ).fetchall()
    import math

    for z, v in rows:
        assert 4096.0 * math.log(4096.0 / z) == v, z


def test_hll_value_hash_null_independent(ray_session):
    """A value must hash IDENTICALLY whether or not its batch happens
    to contain a null (the old null-conditional to_pylist/to_numpy
    split double-counted float32/int values across merged sketches).
    Pinned by splitting the same value set into a null-free and a
    null-carrying batch: the merged estimate must equal the
    single-batch estimate with the null contributing exactly one
    extra distinct identity."""
    import pyarrow as pa
    import ray.data as rd

    from ocaml_geojson_ray.stages.sketches import hll_distinct

    def est(tables):
        ds = rd.from_arrow(tables) if isinstance(tables, list) \
            else rd.from_arrow([tables])
        out = hll_distinct(ds, ["k"], "v", p=12).take_all()
        return {r["k"]: r["approx_distinct"] for r in out}

    for typ, mk in [
        (pa.int64(), lambda xs: xs),
        (pa.float32(), lambda xs: [x / 10.0 for x in xs]),
    ]:
        vals = mk(list(range(200)))
        one = pa.table({"k": pa.array(["a"] * 201),
                        "v": pa.array(vals + [None], typ)})
        # same values split so one batch is null-free, one carries
        # the null — per-batch sketches then merge per key
        half = pa.table({"k": pa.array(["a"] * 100),
                         "v": pa.array(vals[:100], typ)})
        rest = pa.table({"k": pa.array(["a"] * 101),
                         "v": pa.array(vals[100:] + [None], typ)})
        whole, split = est(one), est([half, rest])
        assert whole == split, (typ, whole, split)
        # and the null-free single batch reads exactly one fewer
        nonull = est(pa.table({"k": pa.array(["a"] * 200),
                               "v": pa.array(vals, typ)}))
        assert abs(whole["a"] - nonull["a"]) <= max(
            1, int(0.05 * nonull["a"])), (typ, whole, nonull)


def test_bloom_no_false_negatives():
    from ocaml_geojson_ray.stages.sketches import BloomFilter

    bf = BloomFilter(5000, fpr=0.01).add_many(list(range(5000)))
    assert bf.contains_many(list(range(5000))).all()
    fpr = bf.contains_many(list(range(5000, 25000))).mean()
    assert fpr < 0.03


def test_mine_recovers_lexically_broken_outer_doc():
    """A bad escape in the OUTER document must not shrink mining to the
    well-formed inner geometry; the recovered parse splices U+FFFD
    (jsone.ml:390-397) and the verdict row is ok=True, recovered=True."""
    import pyarrow as pa

    from ocaml_geojson_ray.stages.mine import find_candidates
    from ocaml_geojson_ray.stages.parse_stage import parse_candidates_batch

    doc = ('{"type":"Feature","geometry":{"type":"Point","coordinates":[7.1,46.2]},'
           '"properties":{"name":"z\\qrich"}}')
    text = "prose before " + doc + " prose after"
    cands = find_candidates(text)
    assert len(cands) == 1 and cands[0][2] == doc  # outer doc, not the inner Point

    batch = pa.table({
        "url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
        "lang": ["en"], "cand_idx": pa.array([0], pa.int32()),
        "cand_text": [doc],
    })
    out = parse_candidates_batch(batch)
    assert out["ok"].to_pylist() == [True]
    assert out["recovered"].to_pylist() == [True]
    assert out["properties_json"].to_pylist() == ['{"name":"z�rich"}']


def test_error_range_columns_populated_for_malformed_json():
    """Malformed-JSON verdicts carry the ((l1,c1),(l2,c2)) range
    (geojsone.ml:27-37 Err.t shape)."""
    import pyarrow as pa

    from ocaml_geojson_ray.stages.parse_stage import parse_candidates_batch

    batch = pa.table({
        "url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
        "lang": ["en"], "cand_idx": pa.array([0], pa.int32()),
        "cand_text": ['{"type": nope!,\n "x": 1}'],
    })
    out = parse_candidates_batch(batch)
    assert out["ok"].to_pylist() == [False]
    (l1,), (c1,) = out["error_line"].to_pylist(), out["error_col"].to_pylist()
    (l2,), (c2,) = out["error_line_end"].to_pylist(), out["error_col_end"].to_pylist()
    assert (l1, c1) == (1, 10)
    assert (l2, c2) == (1, 14)  # spans "nope!" up to the char before ','


def test_embedding_neardups_finds_planted_pairs(ray_session):
    """The LSH near-dup path must find REAL positives: planted
    perturbed copies (cos ≈ 0.995) come back as (id, id+OFFSET) pairs,
    each with an exact within-bucket cosine >= the threshold (so every
    emitted pair is also in the exact kernel's >= 0.9 set)."""
    from ocaml_geojson_ray.pipelines.queries import (
        NEARDUP_PLANT_OFFSET,
        q_embedding_neardups,
    )

    df = q_embedding_neardups("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert (df["cosine"] >= 0.9).all()
    # every pair is a planted (original, copy) pair
    assert ((df["b_id"] - df["a_id"]) == NEARDUP_PLANT_OFFSET).all()
    assert (df["a_id"] % 20 == 0).all()


def _fc_doc(n_feats, props_pad=""):
    feats = ",".join(
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[%d,%d]},'
        '"properties":{"i":%d%s}}' % (i % 180, i % 80, i, props_pad)
        for i in range(n_feats)
    )
    return ('{"type":"FeatureCollection","bbox":[0,0,10,10],"features":['
            + feats + '],"source":"synthetic"}')


def test_giant_collection_split_parse_matches_batch_parse(monkeypatch):
    """T7 (geojsone.ml:68-116): an oversized FeatureCollection parses
    feature-by-feature via the incremental splitter with IDENTICAL rows
    to the whole-doc path."""
    import pyarrow as pa

    from ocaml_geojson_ray.stages import parse_stage

    doc = _fc_doc(50)

    def parse(d):
        batch = pa.table({
            "url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
            "lang": ["en"], "cand_idx": pa.array([0], pa.int32()),
            "cand_text": [d],
        })
        return parse_stage.parse_candidates_batch(batch)

    whole = parse(doc)
    monkeypatch.setattr(parse_stage, "GIANT_DOC_BYTES", 100)
    split = parse(doc)
    assert split.equals(whole)
    assert len(split) == 50 and all(split["ok"].to_pylist())


def test_giant_collection_splitter_buffer_is_bounded():
    """The splitter's working buffer stays O(one feature), not O(doc):
    feed chunks and track the internal buffer via a probe iterable."""
    from ocaml_geojson_ray.core.stream_split import iter_features_text

    doc = _fc_doc(200, props_pad=', "pad":"' + "x" * 200 + '"')
    CH = 1024
    chunks = [doc[i:i + CH] for i in range(0, len(doc), CH)]
    n = 0
    for kind, text in iter_features_text(chunks):
        if kind == "feature":
            n += 1
            # each yielded feature is small — the buffer never has to
            # hold more than one feature + a chunk
            assert len(text) < 600
        else:
            assert len(text) < 200  # meta: header + [] + trailer only
    assert n == 200


def test_giant_collection_malformed_falls_back(monkeypatch):
    """A giant doc that is NOT a cleanly-splittable FC falls back to
    whole-doc semantics (identical verdict either way)."""
    import pyarrow as pa

    from ocaml_geojson_ray.stages import parse_stage

    bad = '{"type":"FeatureCollection","features":[{"type":"Nope"}]}'

    def parse(d):
        batch = pa.table({
            "url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
            "lang": ["en"], "cand_idx": pa.array([0], pa.int32()),
            "cand_text": [d],
        })
        return parse_stage.parse_candidates_batch(batch)

    whole = parse(bad)
    monkeypatch.setattr(parse_stage, "GIANT_DOC_BYTES", 10)
    split = parse(bad)
    assert split.equals(whole)


def test_multimodal_audio_and_resize_and_frames(ray_session):
    """The full modality triple: audio features (stub + deterministic
    fake), image resize plumbing, video frame sampling."""
    from ocaml_geojson_ray.stages.multimodal import (
        AudioFeatures,
        ResizeImage,
        frame_sample_batch,
        synth_media_batch,
    )

    t = synth_media_batch(pa.table({"id": pa.array([1, 2, 3], pa.int64())}))
    # unknown mime + no fake → errors-as-data stub rows
    stub = AudioFeatures()(t)
    assert all(e is not None for e in stub["decode_error"].to_pylist())

    a1 = AudioFeatures(fake=True)(t)
    assert "payload" not in a1.column_names
    a2 = AudioFeatures(fake=True)(t)
    assert a1["audio_features"].to_pylist() == a2["audio_features"].to_pylist()
    assert all(len(f) == 3 for f in a1["audio_features"].to_pylist())

    r = ResizeImage(out_w=8, out_h=8, fake=True)(t)
    assert r["width"].to_pylist() == [8, 8, 8]
    assert all(len(b) == 8 * 8 * 3 for b in r["resized"].to_pylist())

    fs = frame_sample_batch(
        pa.table({"media_id": pa.array([7], pa.int64()),
                  "n_frames": pa.array([25], pa.int64())}), every=10)
    assert fs["frame_idx"].to_pylist() == [0, 10, 20]


def test_giant_collection_primitive_elements_fall_back(monkeypatch):
    """features arrays containing primitives (null / numbers / strings)
    are NOT cleanly splittable — the giant path must fall back so the
    verdict matches the whole-doc parse exactly (reference errors)."""
    import pyarrow as pa

    from ocaml_geojson_ray.core.stream_split import (
        NotACollection,
        split_collection_text,
    )
    from ocaml_geojson_ray.stages import parse_stage

    for bad in (
        '{"type":"FeatureCollection","features":[null]}',
        '{"type":"FeatureCollection","features":[1,2]}',
        '{"type":"FeatureCollection","features":["x"]}',
        '{"type":"FeatureCollection","features":[{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{}},null]}',
    ):
        try:
            split_collection_text(bad)
            raise AssertionError(f"should not split: {bad}")
        except NotACollection:
            pass

        def parse(d):
            batch = pa.table({
                "url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
                "lang": ["en"], "cand_idx": pa.array([0], pa.int32()),
                "cand_text": [d],
            })
            return parse_stage.parse_candidates_batch(batch)

        whole = parse(bad)
        monkeypatch.setattr(parse_stage, "GIANT_DOC_BYTES", 10)
        split = parse(bad)
        monkeypatch.undo()
        assert split.equals(whole), bad


def test_giant_collection_duplicate_features_key_falls_back():
    """json.loads keeps the LAST duplicate key; the splitter grabs the
    FIRST array — duplicates must bail to the whole-doc path."""
    from ocaml_geojson_ray.core.stream_split import (
        NotACollection,
        split_collection_text,
    )

    f1 = '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"v":1}}'
    f2 = '{"type":"Feature","geometry":{"type":"Point","coordinates":[3,4]},"properties":{"v":2}}'
    dup = ('{"type":"FeatureCollection","features":[%s],"features":[%s]}'
           % (f1, f2))
    try:
        split_collection_text(dup)
        raise AssertionError("duplicate features key must not split")
    except NotACollection:
        pass
    # a NESTED "features" key in a trailing member is fine
    ok = ('{"type":"FeatureCollection","features":[%s],"meta":{"features":[1]}}'
          % f1)
    feats, meta = split_collection_text(ok)
    assert len(feats) == 1


def test_giant_collection_escaped_duplicate_features_key(monkeypatch):
    """A shadowing duplicate spelled with a JSON escape
    ("\\u0066eatures") decodes to the same key — json.loads keeps the
    LAST array, so the splitter must bail (member names are decoded
    before comparing) and the parse path must match whole-doc rows."""
    import json

    import pyarrow as pa

    from ocaml_geojson_ray.core.stream_split import (
        NotACollection,
        split_collection_text,
    )
    from ocaml_geojson_ray.stages import parse_stage

    f1 = '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"v":1}}'
    f2 = '{"type":"Feature","geometry":{"type":"Point","coordinates":[3,4]},"properties":{"v":2}}'
    dup = ('{"type":"FeatureCollection","features":[%s],"\\u0066eatures":[%s]}'
           % (f1, f2))
    assert len(json.loads(dup)["features"]) == 1  # last (escaped) wins
    try:
        split_collection_text(dup)
        raise AssertionError("escaped duplicate features key must not split")
    except NotACollection:
        pass

    def parse(d):
        batch = pa.table({
            "url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
            "lang": ["en"], "cand_idx": pa.array([0], pa.int32()),
            "cand_text": [d],
        })
        return parse_stage.parse_candidates_batch(batch)

    whole = parse(dup)
    monkeypatch.setattr(parse_stage, "GIANT_DOC_BYTES", 10)
    split = parse(dup)
    assert split.equals(whole)


def test_giant_collection_recovered_flag_is_per_document(monkeypatch):
    """recovered marks the DOCUMENT (whole-doc semantics): a bad escape
    in one feature marks every emitted row on both paths."""
    import pyarrow as pa

    from ocaml_geojson_ray.stages import parse_stage

    doc = ('{"type":"FeatureCollection","features":['
           '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"name":"a\\qb"}},'
           '{"type":"Feature","geometry":{"type":"Point","coordinates":[3,4]},"properties":{}}'
           ']}')

    def parse(d):
        batch = pa.table({
            "url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
            "lang": ["en"], "cand_idx": pa.array([0], pa.int32()),
            "cand_text": [d],
        })
        return parse_stage.parse_candidates_batch(batch)

    whole = parse(doc)
    monkeypatch.setattr(parse_stage, "GIANT_DOC_BYTES", 10)
    split = parse(doc)
    assert whole["recovered"].to_pylist() == [True, True]
    assert split.equals(whole)


def test_verify_pairs_distributed(ray_session):
    """Pairs join back to the docs table for texts; only >= threshold
    Jaccard survives; no broadcast of the corpus."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.dedup import verify_pairs_distributed

    docs = rd.from_items([
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon"},
        {"doc_id": 2, "text": "alpha beta gamma delta zeta"},
        {"doc_id": 3, "text": "completely different words here now"},
    ])
    pairs = rd.from_items([
        {"a_id": 1, "b_id": 2, "n_shared_bands": 3},
        {"a_id": 1, "b_id": 3, "n_shared_bands": 1},
    ])
    out = verify_pairs_distributed(pairs, docs, threshold=0.3).to_pandas()
    assert set(zip(out["a_id"], out["b_id"])) == {(1, 2)}
    # jaccard of 3-gram sets: {abc,bcd,cde} vs {abc,bcd,cdz} -> 2/4
    assert abs(out["jaccard"].iloc[0] - 0.5) < 1e-12
    assert "n_shared_bands" in out.columns  # pair metadata carried through


def test_misra_gries_guarantee():
    """Deterministic MG guarantee: every item with true count > N/k
    survives, stored counts never exceed true counts, and merge
    preserves the property."""
    import numpy as np

    from ocaml_geojson_ray.stages.sketches import MisraGries

    rng = np.random.default_rng(9)
    # zipf-ish stream with a few genuine heavy hitters
    stream = np.concatenate([
        np.repeat(np.arange(5), 500),            # heavy
        rng.integers(100, 5000, size=8000),      # tail
    ])
    rng.shuffle(stream)
    k = 16
    mg = MisraGries(k)
    # feed in chunks (weighted adds, like per-batch partials)
    for chunk in np.array_split(stream, 7):
        u, c = np.unique(chunk, return_counts=True)
        mg.add_weighted(u.tolist(), c.tolist())
    true = {int(u): int(c) for u, c in
            zip(*np.unique(stream, return_counts=True))}
    N = len(stream)
    assert mg.total == N
    surv = mg.survivors()
    for item, cnt in true.items():
        if cnt > N / k:
            assert item in surv, item
    for item, stored in surv.items():
        assert stored <= true[int(item)]

    # merge two halves == guarantee still holds on the union
    a, b = MisraGries(k), MisraGries(k)
    half = len(stream) // 2
    for sketch, part in ((a, stream[:half]), (b, stream[half:])):
        u, c = np.unique(part, return_counts=True)
        sketch.add_weighted(u.tolist(), c.tolist())
    a.merge(b)
    assert a.total == N
    for item, cnt in true.items():
        if cnt > N / k:
            assert item in a.survivors(), item


def test_kll_quantiles_and_merge():
    from ocaml_geojson_ray.stages.sketches import KLL

    rng = np.random.default_rng(17)
    data = rng.lognormal(3.0, 1.0, 200_000)
    # chunked adds + pairwise merges must match one-shot accuracy
    chunks = np.array_split(data, 37)
    sketches = [KLL(200, seed=i).add_batch(c) for i, c in enumerate(chunks)]
    m = sketches[0]
    for s in sketches[1:]:
        m.merge(s)
    assert m.n == len(data)
    sorted_d = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = m.quantile(q)
        rank = np.searchsorted(sorted_d, est, side="right") / len(data)
        assert abs(rank - q) <= 0.02, (q, rank)
    # sketch stays compact: k log(n/k) items, not n
    held = sum(len(b) for b in m.levels)
    assert held < 3000


def test_kll_deterministic_given_seed():
    from ocaml_geojson_ray.stages.sketches import KLL

    data = np.arange(50_000, dtype=np.float64)
    a = KLL(128, seed=7).add_batch(data)
    b = KLL(128, seed=7).add_batch(data)
    assert a.quantile(0.5) == b.quantile(0.5)
    assert all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))


def test_kmeans_inertia_monotone_and_partition(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.stages.kmeans import kmeans_assign_sizes, kmeans_fit

    rng = np.random.default_rng(23)
    # three well-separated blobs
    blobs = np.concatenate([
        rng.normal(0, 0.1, (60, 8)),
        rng.normal(5, 0.1, (60, 8)),
        rng.normal(-5, 0.1, (60, 8)),
    ])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(180), pa.int64()),
        "embedding": pa.array(blobs.tolist(), pa.list_(pa.float64())),
    }))
    cents, inertias = kmeans_fit(ds, k=3, iters=5)
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a + 1e-9
    # converged centroids sit on the blob means
    means = sorted(round(float(c[0])) for c in cents)
    assert means == [-5, 0, 5]
    sizes = kmeans_assign_sizes(ds, cents).to_pandas()
    assert sorted(sizes["size"].tolist()) == [60, 60, 60]


def test_kmeans_int_order_independent_and_exact(ray_session):
    """The integer-grid Lloyd's twin must be a pure function of the
    input MULTISET — reversing row order and changing the block split
    may not move a single centroid coordinate or inertia bit (this is
    the property that makes SQL_KMEANS_INT_CLUSTERS checkable; float
    Lloyd's block-order-dependent sums have no such guarantee)."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.kmeans import (
        kmeans_int_assign, kmeans_int_fit)

    rng = np.random.default_rng(31)
    blobs = np.concatenate([
        rng.normal(0.0, 0.02, (60, 8)),
        rng.normal(0.8, 0.02, (60, 8)),
        rng.normal(-0.8, 0.02, (60, 8)),
    ])
    ids = np.arange(180)
    t_fwd = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(blobs.tolist(), pa.list_(pa.float64())),
    })
    t_rev = t_fwd.take(pa.array(ids[::-1]))
    ds_fwd = rd.from_arrow(t_fwd)
    ds_rev = rd.from_arrow(t_rev).repartition(7)
    c1, i1 = kmeans_int_fit(ds_fwd, k=3, iters=3)
    c2, i2 = kmeans_int_fit(ds_rev, k=3, iters=3)
    assert np.array_equal(c1, c2) and i1 == i2
    out = kmeans_int_assign(ds_fwd, c1).to_pandas()
    assert sorted(out["n_vecs"].tolist()) == [60, 60, 60]
    # centroids sit on the quantized blob means (offset 2^20, scale 1e6)
    means = sorted(round((m - 2**20) / 1e6, 1)
                   for m in (c1[:, 0].astype(float)))
    assert means == [-0.8, 0.0, 0.8]


def test_curation_repetition_stats_hand_computed():
    from ocaml_geojson_ray.stages.curation import repetition_stats

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            "a a a a",          # 4 tokens, 1 distinct, max 2-gram "a a" x3
            "w x y z",          # all distinct, every 2-gram unique
            "   ",              # whitespace-only -> dropped
            "solo",             # 1 token; 2-gram kernel emits combined gram
        ],
    })
    out = repetition_stats(batch)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert set(rows) == {1, 2, 4}
    r1 = rows[1]
    assert (r1["n_tokens"], r1["n_distinct"], r1["max_2gram"]) == (4, 1, 3)
    assert r1["dup_word_frac"] == 0.75 and r1["flagged"]
    r2 = rows[2]
    assert (r2["n_distinct"], r2["max_2gram"]) == (4, 1)
    assert r2["dup_word_frac"] == 0.0 and r2["top2_frac"] == 0.5
    r4 = rows[4]
    assert (r4["n_tokens"], r4["n_distinct"]) == (1, 1)


def test_curation_pii_redaction_plants_and_redacts():
    from ocaml_geojson_ray.stages.curation import redact_pii

    batch = pa.table({
        "doc_id": pa.array([77, 7, 11, 5], pa.int64()),
        "lang": ["en"] * 4,
        "text": ["base text"] * 4,
    })
    out = {r["doc_id"]: r for r in redact_pii(batch).to_pylist()}
    assert set(out) == {77, 7, 11}          # 5 has no planted PII
    assert (out[77]["n_email"], out[77]["n_phone"]) == (1, 1)
    assert (out[7]["n_email"], out[7]["n_phone"]) == (1, 0)
    assert (out[11]["n_email"], out[11]["n_phone"]) == (0, 1)
    # redacted length: "base text" + " contact <EMAIL> now" etc.
    assert out[7]["red_len"] == len("base text contact <EMAIL> now")
    assert out[11]["red_len"] == len("base text call <PHONE> soon")


def test_curation_decontamination_counts(ray_session):
    import ray
    import ray.data as rd

    from ocaml_geojson_ray.stages.curation import (
        contamination_counts, eval_gram_batches)

    k, mod = 3, 7
    eval_text = "one two three four five"          # doc 0 (eval: 0 % 7 == 0)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            eval_text,
            "zz one two three yy",   # shares gram "one two three"
            "totally different words here",
            "three four five and more trailing",  # shares "three four five"
        ],
    }))
    parts = [b["gram"].to_numpy() for b in
             eval_gram_batches(ds, k, mod).iter_batches(batch_format="pyarrow")]
    ev = np.unique(np.concatenate(parts))
    assert len(ev) == 3                      # 5 words -> 3 trigrams
    out = contamination_counts(ds, ray.put(ev), k, mod)
    rows = {r["doc_id"]: r["n_shared"] for r in out.take_all()}
    assert rows == {1: 1, 3: 1}

    # short doc (< k words) uses the combined-gram rule on both sides
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["tiny doc", "tiny doc"],
    }))
    parts2 = [b["gram"].to_numpy() for b in
              eval_gram_batches(ds2, k, mod).iter_batches(batch_format="pyarrow")]
    ev2 = np.unique(np.concatenate(parts2))
    rows2 = {r["doc_id"]: r["n_shared"]
             for r in contamination_counts(ds2, ray.put(ev2), k, mod).take_all()}
    assert rows2 == {1: 1}


def test_span_dedup_hand_computed():
    from ocaml_geojson_ray.stages.dedup import (
        _span_rows_batch, _span_stats_table)

    b = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            "a b c d e f",      # spans [a b c][d e f] — all winners
            "a b c x y",        # [a b c] dup of doc1, [x y] kept
            "a b c a b c d",    # both [a b c] dup, [d] kept
            "   ",              # no spans
        ],
    })
    rows = _span_rows_batch(b, span_w=3)
    st = {r["doc_id"]: r for r in _span_stats_table(
        rows["span_hash"].to_numpy(), rows["packed"].to_numpy(),
        rows["cnt"].to_numpy(), rows["doc_id"].to_numpy()).to_pylist()}
    assert set(st) == {2, 3}
    assert (st[2]["n_spans"], st[2]["dup_spans"], st[2]["kept_spans"]) == (2, 1, 1)
    assert (st[3]["n_spans"], st[3]["dup_spans"], st[3]["kept_spans"]) == (3, 2, 1)


def test_span_dedup_plans_equal(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.stages.dedup import span_dedup_stats

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    funnel = sorted(span_dedup_stats(ds).take_all(),
                    key=lambda r: r["doc_id"])
    dist = sorted(span_dedup_stats(ds, small_rows=0).take_all(),
                  key=lambda r: r["doc_id"])
    assert funnel == dist
    assert len(funnel) > 0


def test_span_scrub_plans_equal_and_semantics(ray_session):
    """span_scrub: broadcast plan ≡ join plan on the fixture corpus,
    and the hand-checkable semantics hold — a doc that repeats an
    earlier doc's span loses that occurrence; a doc that is ALL
    duplicates disappears."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.dedup import span_scrub

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    small = sorted(span_scrub(ds).take_all(), key=lambda r: r["doc_id"])
    large = sorted(span_scrub(ds, small_rows=0).take_all(),
                   key=lambda r: r["doc_id"])
    assert small == large
    assert len(small) > 0

    docs = [
        "a b c x y z",      # doc 1: spans (a b c), (x y z) — both win
        "a b c q r s",      # doc 2: loses (a b c), keeps (q r s)
        "a b c a b c",      # doc 3: loses everything → dropped
    ]
    tiny = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    got = {r["doc_id"]: r["clean_text"]
           for r in span_scrub(tiny, span_w=3).take_all()}
    assert got == {1: "a b c x y z", 2: "q r s"}


def test_table_stats_wide_ndv_gate(ray_session):
    """VERDICT r4 #2: the exact-NDV funnel must be size-gated. With a
    high-NDV key column and the gate forced low, analyze_table flips
    to the grouped plan: NDV comes from a distributed (col, val)
    groupby, the single-task funnel receives only bounded tallies
    (raw value rows reaching it RAISE in-task), and the answers are
    identical to the funnel plan's."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.catalog import analyze_table

    n = 4_000  # every key distinct -> partial rows ≈ n per column
    t = pa.table({
        "k": pa.array(list(range(n)), pa.int64()),
        "s": pa.array([f"v{i % 7}" for i in range(n - 1)] + [None],
                      pa.string()),
    })

    def series(b: pa.Table) -> dict:
        s = b["s"].combine_chunks()
        return {
            "k": (b["k"].combine_chunks().drop_null()
                  .to_numpy(zero_copy_only=False).astype(str),
                  b["k"].null_count),
            "s": (np.asarray(s.drop_null().to_pylist(), dtype=object),
                  s.null_count),
        }

    def ds_fn():
        return rd.from_arrow(t).repartition(8)

    def rows(res):
        return sorted(tuple(r.values()) for r in res.take_all())

    # n_cols enables the free tier: rows*2 <= bound -> no gate pass
    funnel = analyze_table(ds_fn, series, ("k",), n_cols=2,
                           funnel_rows=10**9)
    grouped = analyze_table(ds_fn, series, ("k",), n_cols=2,
                            funnel_rows=100)
    want = [("k", n, 0, "0", str(n - 1), n),
            ("s", n, 1, "v0", "v6", 7)]
    got_f, got_g = rows(funnel), rows(grouped)
    assert got_f == want
    assert got_g == want


def test_span_scrub_empty_corpus(ray_session):
    """ADVICE r4: an empty / all-whitespace corpus yields ZERO spans;
    the small plan must return the empty (doc_id, clean_text) result
    instead of IndexError-ing on the hardcoded runfirst=[True]."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.dedup import span_scrub

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert span_scrub(empty, span_w=3).take_all() == []

    # all-whitespace docs: rows exist but no doc reaches one full span
    ws = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["   ", "\t \n"], pa.string()),
    }))
    assert span_scrub(ws, span_w=3).take_all() == []


def test_split_read_scopes_buffer_override(ray_session):
    """ADVICE r4: split_read raises the private streaming-generator
    buffer ONLY for the dataset it creates — the plan's captured
    DataContext keeps the raised value, the process-global context is
    restored, and a missing/renamed private attribute degrades to a
    plain read instead of crashing."""
    import ray.data as rd

    from ocaml_geojson_ray.util import split_read

    ctx = rd.DataContext.get_current()
    before = ctx._max_num_blocks_in_streaming_gen_buffer
    ds = split_read("/root/testdata/sf0.001/documents.parquet",
                    ["doc_id"], nblocks=16)
    # global restored; the dataset's captured context carries the raise
    assert ctx._max_num_blocks_in_streaming_gen_buffer == before
    captured = ds._plan._context._max_num_blocks_in_streaming_gen_buffer
    assert captured == max(before, 16)
    assert ds.count() > 0

    # degraded-mode drill: a non-int field value (Ray's "auto" None, or
    # a future rename leaving getattr -> None) must take the graceful
    # path — no override attempted, read still works, value untouched
    saved = ctx._max_num_blocks_in_streaming_gen_buffer
    try:
        ctx._max_num_blocks_in_streaming_gen_buffer = None
        ds2 = split_read("/root/testdata/sf0.001/documents.parquet",
                         ["doc_id"], nblocks=4)
        assert ctx._max_num_blocks_in_streaming_gen_buffer is None
        assert ds2.count() > 0
    finally:
        ctx._max_num_blocks_in_streaming_gen_buffer = saved


def test_curation_url_domain_partials():
    from ocaml_geojson_ray.stages.curation import domain_partials

    b = pa.table({
        "doc_id": pa.array([9, 3, 1], pa.int64()),
        "text": ["t"] * 3,
    })
    # doc 9: https site9.example.com + http mirror4.example.org
    # doc 3: https site3.example.com only; doc 1: none
    out = {(r["domain"], r["tld"]): r["n"]
           for r in domain_partials(b).to_pylist()}
    assert out == {
        ("site9.example.com", "com"): 1,
        ("site3.example.com", "com"): 1,
        ("mirror4.example.org", "org"): 1,
    }


def test_shard_packing_plans_equal(ray_session):
    import ray.data as rd

    from ocaml_geojson_ray.stages.curation import shard_packing

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    funnel = sorted(shard_packing(ds).take_all(),
                    key=lambda r: r["shard_id"])
    # small range_w forces many ranges through the distributed
    # two-phase scan; shard boundaries straddle ranges
    dist = sorted(shard_packing(ds, small_rows=0, range_w=64).take_all(),
                  key=lambda r: r["shard_id"])
    assert funnel == dist
    assert len(funnel) > 3
    # invariant: every shard except the last holds >= 4096 tokens
    # only via its LAST doc overflowing; equivalently all shards
    # except possibly the last have shard_tokens + first-doc slack
    # around the budget — check total conservation instead
    assert sum(r["shard_tokens"] for r in funnel) > 0


def test_shard_packing_token_counts_definitional():
    from ocaml_geojson_ray.stages.curation import ascii_token_counts

    # "\u00a0" (NBSP) is NOT in the ASCII class -> it is a token,
    # matching string_split_regex on both sides
    t = pa.array(["a b  c", "", "   ", "\u00a0", " ", "x\ty\nz\r"])
    assert ascii_token_counts(t).tolist() == [3, 0, 0, 1, 0, 3]


def test_pagerank_plans_equal(ray_session):
    """Broadcast (ray.put shares + streamed edge pass) and distributed
    (join + groupby per iteration) PageRank plans produce the IDENTICAL
    integer rank table — the recurrence is order-independent int64 by
    design (stages/pagerank.py)."""
    from ocaml_geojson_ray.pipelines.queries import q_pagerank_parts

    b = q_pagerank_parts("/root/testdata/sf0.001").to_pandas()
    d = q_pagerank_parts("/root/testdata/sf0.001",
                         plan="distributed").to_pandas()
    # reread source (VERDICT r4 #5): each iteration re-reads the pruned
    # two-column parquet instead of a pinned materialize — bit-equal
    r = q_pagerank_parts("/root/testdata/sf0.001",
                         plan="reread").to_pandas()
    bb = b.sort_values("node").reset_index(drop=True)
    dd = d.sort_values("node").reset_index(drop=True)
    rr = r.sort_values("node").reset_index(drop=True)
    assert len(bb) == len(dd) > 0
    assert (bb["node"].to_numpy() == dd["node"].to_numpy()).all()
    assert (bb["pr_rank"].to_numpy() == dd["pr_rank"].to_numpy()).all()
    assert (bb["node"].to_numpy() == rr["node"].to_numpy()).all()
    assert (bb["pr_rank"].to_numpy() == rr["pr_rank"].to_numpy()).all()
    # distributed plan with a FACTORY edge source (no directed-edge
    # materialize) — the above-the-gate combination — is also bit-equal
    from ocaml_geojson_ray.stages.pagerank import pagerank_distributed
    from ocaml_geojson_ray.util import split_read

    dr = pagerank_distributed(
        lambda: split_read("/root/testdata/sf0.001/lineitem.parquet",
                           ["l_partkey", "l_suppkey"], 4)
    ).to_pandas().sort_values("node").reset_index(drop=True)
    assert (bb["node"].to_numpy() == dr["node"].to_numpy()).all()
    assert (bb["pr_rank"].to_numpy() == dr["pr_rank"].to_numpy()).all()
    # mass sanity: total rank stays within damping bounds of n*SCALE
    n = len(bb)
    assert bb["pr_rank"].sum() <= n * 1_000_000_000
    assert bb["pr_rank"].min() >= 150_000_000


def test_importance_scores_separate_target_from_raw(ray_session):
    """Target-exclusive vocabulary scores positive, off-target
    vocabulary negative, zero-token docs exactly 0 (the integer
    probability-gap form ct*R - cr*T, stages/curation.py)."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.curation import (importance_scores,
                                                   importance_weights)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["alpha beta alpha", "alpha beta gamma",
                          "omega psi omega psi", "   "]),
        "lang": pa.array(["en", "en", "fr", "fr"]),
    })
    ds = rd.from_arrow(t)
    w = importance_weights(ds)
    out = importance_scores(ds, w).to_pandas().set_index("doc_id")["score"]
    assert out[1] > 0 and out[2] > 0   # pure target vocab
    assert out[3] < 0                  # pure off-target vocab
    assert out[4] == 0                 # zero tokens


def test_semdedup_greedy_semantics(ray_session):
    """Hand-built cluster: of three mutual near-duplicates the LOWEST
    id survives and both others drop against it (greedy keep-first),
    while an orthogonal vector in the same space is kept."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.dedup import semdedup

    base = np.zeros(8)
    base[0] = 1.0
    near1 = base + 0.01 * np.arange(8) / 8
    near2 = base - 0.01 * np.arange(8) / 8
    ortho = np.zeros(8)
    ortho[1] = 1.0
    t = pa.table({
        "vec_id": pa.array([10, 11, 12, 13], pa.int64()),
        "embedding": pa.array([base.tolist(), near1.tolist(),
                               near2.tolist(), ortho.tolist()],
                              pa.list_(pa.float64())),
    })
    out = semdedup(rd.from_arrow(t), k=2, tau=0.99).to_pandas() \
        .set_index("vec_id")
    assert bool(out.loc[10, "kept"])          # lowest id survives
    assert not out.loc[11, "kept"] and not out.loc[12, "kept"]
    assert bool(out.loc[13, "kept"])          # orthogonal point kept
    assert out.loc[11, "max_sim_kept"] >= 0.99


def test_json_props_errors_as_data():
    """json_props_stats' SHARED extraction gate (the same function the
    query's batch kernel calls): NULL, malformed JSON, non-object,
    missing field, bool, string-number and non-integer k all DROP
    (never raise) — the mine/parse errors-as-data convention on a
    relational column. The oracle mirrors every case via
    TRY_CAST + json_type (verified row-for-row in development)."""
    from ocaml_geojson_ray.pipelines.queries import extract_json_int_k

    props = [
        '{"k": 3}', '{"k": 3.0}',      # both count (3.0 is integral)
        '{"k": 3.5}',                  # non-integer -> drop
        '{"k": true}',                 # bool -> drop (DuckDB side: json_type)
        '{"k": "12"}',                 # string number -> drop (json_type)
        '{"j": 1}', '[1,2]', '{bad',   # missing / non-object / malformed
        None,                          # NULL props -> drop, not TypeError
        '{"k": -7}',                   # negative integer counts
    ]
    idx, ks = extract_json_int_k(props)
    assert idx.tolist() == [0, 1, 9]
    assert ks.tolist() == [3, 3, -7]


def test_curriculum_shards_plans_equal(ray_session):
    """Funnel and value-range two-phase plans assign IDENTICAL
    (doc_id, shard_id) — the ordered scan is deterministic under any
    partitioning (stages/curation.curriculum_shards); shard 0 holds
    the highest scores."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.curation import curriculum_shards

    rng = np.random.default_rng(11)
    n = 500
    t = pa.table({
        "doc_id": pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
        "score": pa.array(rng.integers(-1000, 1000, n).astype(np.int64),
                          pa.int64()),
        "n": pa.array(rng.integers(1, 200, n).astype(np.int64), pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    funnel = {r["doc_id"]: r["shard_id"]
              for r in curriculum_shards(ds, shard_tokens=1000).take_all()}
    # small_rows=0 forces the value-range plan; n_ranges=7 forces
    # shard boundaries to straddle range boundaries
    dist = {r["doc_id"]: r["shard_id"]
            for r in curriculum_shards(ds, shard_tokens=1000, n_ranges=7,
                                       small_rows=0).take_all()}
    assert funnel == dist and len(funnel) == n
    # shard 0 contains the top scores
    s = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
    top = max(s, key=lambda d: (s[d], -d))
    assert funnel[top] == 0


def test_pq_adc_identical_vectors_tie(ray_session):
    """PQ property pins (stages/ann.pq_fit/pq_topk): identical vectors
    encode to identical codes, so their ADC distances to any query are
    EQUAL — and a query's own copy ranks at the top among random
    distractors."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.ann import pq_fit, pq_topk

    rng = np.random.default_rng(2)
    d, n = 16, 120
    vecs = rng.standard_normal((n, d))
    vecs[1] = vecs[0]  # exact duplicate pair (ids 1 and 2 below)
    t = pa.table({
        "vec_id": pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })
    books = pq_fit(vecs, m=4, ksub=8)
    assert books.shape == (4, 8, 4)
    out = pq_topk(rd.from_arrow(t), {1: vecs[0].tolist()}, k=5,
                  m=4, ksub=8).to_pandas()
    top = out.sort_values("rank")
    # the duplicate pair (ids 1, 2) shares codes -> equal ADC -> both
    # at the top, id tie-break first
    assert list(top["vec_id"][:2]) == [1, 2]
    assert abs(top["adc"].iloc[0] - top["adc"].iloc[1]) == 0.0


def test_streaming_dedup_drops_cross_batch_duplicates(ray_session):
    """The shared-index admission filter: duplicates are dropped even
    when they arrive in DIFFERENT batches/blocks (the case a pure
    per-batch UDF cannot handle), exactly one survivor per distinct
    text, shard sizes sum to the distinct count."""
    import ray
    import ray.data as rd

    from ocaml_geojson_ray.stages.streaming_dedup import (
        start_dedup_pool, streaming_exact_dedup)

    texts = [f"doc {i % 7}" for i in range(100)]  # 7 distinct, heavy dups
    t = pa.table({
        "doc_id": pa.array(np.arange(100, dtype=np.int64), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(8)  # duplicates split across blocks
    pool = start_dedup_pool(4)
    out = streaming_exact_dedup(ds, pool)  # materialized by contract
    df = out.to_pandas()
    assert len(df) == 7
    assert sorted(df["text"]) == sorted(set(texts))
    assert sum(ray.get([a.size.remote() for a in pool])) == 7
    # a later arrival of an already-admitted text is rejected
    late = pa.table({"doc_id": pa.array([999], pa.int64()),
                     "text": pa.array(["doc 0"], pa.string())})
    out2 = streaming_exact_dedup(rd.from_arrow(late), pool)
    assert out2.count() == 0


def test_streaming_dedup_retry_idempotent(ray_session):
    """VERDICT r4 #3: admission is exactly-once under task retry. A
    re-sent batch (same rows → same idempotence token) receives
    bit-identical admissions — NOT the old at-most-once behavior of
    dropping every row because its own hashes are 'already seen' —
    while a DIFFERENT batch carrying the same texts is still fully
    rejected."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.streaming_dedup import (
        make_admit_fn, start_dedup_pool)

    pool = start_dedup_pool(4)
    admit = make_admit_fn(pool, "text", "doc_id")
    batch = pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        # within-batch duplicate: 'b' twice -> second must stay False
        "text": pa.array(["a", "b", "b", "c"], pa.string()),
    })
    first = admit(batch)
    assert first["doc_id"].to_pylist() == [10, 11, 13]
    # simulated Ray task retry: the SAME batch re-presented
    retried = admit(batch)
    assert retried.equals(first)
    # a different batch (new row ids) with duplicate texts: all dropped
    other = pa.table({
        "doc_id": pa.array([20, 21], pa.int64()),
        "text": pa.array(["a", "c"], pa.string()),
    })
    assert len(admit(other)) == 0
    # and retry-after-rejection replays the rejection
    assert len(admit(other)) == 0


def test_streaming_dedup_shard_spill_bounded(ray_session, tmp_path):
    """The shard's hot dict is capped: overflow freezes into sorted
    runs (on disk when spill_dir is set), membership and the retry
    replay both keep working across the freeze, and the Python-heap
    dict never exceeds flush_at."""
    import ray

    from ocaml_geojson_ray.stages.streaming_dedup import start_dedup_pool

    (shard,) = start_dedup_pool(1, flush_at=8, spill_dir=str(tmp_path))
    t1, t2, t3 = 101, 202, 303
    first = ray.get(shard.admit.remote(t1, list(range(20))))
    assert first == [True] * 20
    assert ray.get(shard.size.remote()) == 20
    assert ray.get(shard.n_runs.remote()) >= 1          # froze at least once
    assert ray.get(shard.hot_len.remote()) <= 8         # heap stays bounded
    assert list(tmp_path.glob("*_h.npy"))               # spilled to disk
    # membership survives the freeze: re-ask from a NEW batch -> dup
    assert ray.get(shard.admit.remote(t2, [3, 15, 999])) == \
        [False, False, True]
    # retry replay reaches into frozen runs: original admitter says True
    assert ray.get(shard.admit.remote(t1, list(range(20)))) == [True] * 20
    # new-value admission still works post-freeze
    assert ray.get(shard.admit.remote(t3, [5000, 3])) == [True, False]
    assert ray.get(shard.size.remote()) == 22


def test_winnow_fingerprints_matches_scalar_reference(ray_session):
    """Winnowing (MOSS): the vectorized batch kernel must equal the
    per-doc scalar definition — k-gram md5-LE-64 hashes, min of every
    w-window, distinct values — across the edge zoo (empty doc,
    whitespace-only, 1..k-1 words, exactly w grams, long doc with
    repeated text)."""
    import hashlib
    import re
    import struct

    import ray.data as rd

    from ocaml_geojson_ray.stages.curation import winnow_fingerprints

    def ref(text, k=3, w=4):
        ws = [x for x in re.split(r"[ \t\n\r\f\v]+", text) if x != ""]
        if not ws:
            return set()
        grams = ([" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
                 if len(ws) >= k else [" ".join(ws)])
        hs = [struct.unpack(
            "<Q", hashlib.md5(g.encode()).digest()[:8])[0] & (2**63 - 1)
            for g in grams]
        if len(hs) >= w:
            return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}
        return {min(hs)}

    docs = [
        "",                       # no tokens -> no fingerprints
        "   \t ",                 # whitespace-only -> none
        "one",                    # 1 word -> combined gram
        "two words",              # k-1 words -> combined gram
        "a b c",                  # exactly k words -> 1 gram < w
        "a b c d e f",            # 4 grams = exactly one full window set
        ("the quick brown fox jumps over the lazy dog " * 6).strip(),
        "x y z " * 30 + "tail words here",
    ]
    t = pa.table({
        "doc_id": pa.array(list(range(len(docs))), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    out = winnow_fingerprints(rd.from_arrow(t).repartition(3)).take_all()
    got: dict[int, set] = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, d in enumerate(docs):
        assert got.get(i, set()) == ref(d), f"doc {i}: {d[:30]!r}"


def test_vec_mat_guards_and_alignment():
    """vec_mat must (a) stay zero-copy-correct on SLICED FixedSizeList
    arrays (offset compensation), and (b) raise loudly on row-level AND
    element-level nulls — to_numpy would NaN-coerce an element null and
    an int target dtype then silently turns it into INT64_MIN."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from ocaml_geojson_ray.util import vec_mat

    m = vec_mat(pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float64())))
    assert m.shape == (2, 2) and m[1, 1] == 4.0
    f = pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32(), 2))
    assert vec_mat(f).dtype == np.float64
    assert vec_mat(f.slice(1, 1)).tolist() == [[3.0, 4.0]]
    with pytest.raises(ValueError, match="null entries"):
        vec_mat(pa.array([[1.0, 2.0], None], pa.list_(pa.float64())))
    for bad in (pa.array([[1, None, 3]], pa.list_(pa.int64())),
                pa.array([[1.0, None]], pa.list_(pa.float64(), 2))):
        with pytest.raises(ValueError, match="null elements"):
            vec_mat(bad, np.int64)


def test_stats_only_partial_matches_full_partial():
    """The grouped plan's slim O(n) stats partial must emit EXACTLY the
    stats rows the full (np.unique) partial emits — same n/n_null and
    the same canonical min/max, including lexicographic string
    extremes and the all-NULL-batch case."""
    from ocaml_geojson_ray.stages.catalog import (_partial_factory,
                                                  _stats_only_factory)

    def series(b: pa.Table) -> dict:
        s = b["s"].combine_chunks()
        k = b["k"].combine_chunks()
        return {
            "k": (k.drop_null().to_numpy(zero_copy_only=False).astype(str),
                  k.null_count),
            "s": (np.asarray(s.drop_null().to_pylist(), dtype=object),
                  s.null_count),
        }

    numeric = frozenset(("k",))
    full = _partial_factory(series, numeric)
    slim = _stats_only_factory(series, numeric)
    batches = [
        pa.table({"k": pa.array([3, -7, 12, None], pa.int64()),
                  "s": pa.array(["zz", "a", "Mid", "a"], pa.string())}),
        pa.table({"k": pa.array([None, None], pa.int64()),
                  "s": pa.array([None, None], pa.string())}),
        pa.table({"k": pa.array([2**40, -2**40], pa.int64()),
                  "s": pa.array(["b", "b"], pa.string())}),
    ]
    for b in batches:
        want = full(b).filter(pa.compute.is_null(full(b)["val"]))
        got = slim(b)
        assert got.equals(want), (b, got.to_pydict(), want.to_pydict())


def test_hll_string_values_null_independent(ray_session):
    """String-value HLL: same split-batch merge-equality contract as
    the int/float cases (the string path always hashes Python scalars
    via to_pylist, so a null in the batch must not change hashes)."""
    import pyarrow as pa
    import ray.data as rd

    from ocaml_geojson_ray.stages.sketches import hll_distinct

    vals = [f"w{i}" for i in range(150)]
    one = pa.table({"k": pa.array(["a"] * 151),
                    "v": pa.array(vals + [None], pa.string())})
    half = pa.table({"k": pa.array(["a"] * 75),
                     "v": pa.array(vals[:75], pa.string())})
    rest = pa.table({"k": pa.array(["a"] * 76),
                     "v": pa.array(vals[75:] + [None], pa.string())})

    def est(tabs):
        out = hll_distinct(rd.from_arrow(tabs), ["k"], "v", p=12).take_all()
        return {r["k"]: r["approx_distinct"] for r in out}

    assert est([one]) == est([half, rest])


def test_streaming_dedup_double_retry_across_freeze(ray_session, tmp_path):
    """Exactly-once must survive a retry that lands AFTER the hash's
    hot-dict entry was frozen to a (spilled) run, and a SECOND retry
    after that — every replay answers bit-identically, including the
    within-call-duplicate False."""
    import ray

    from ocaml_geojson_ray.stages.streaming_dedup import start_dedup_pool

    pool = start_dedup_pool(nshards=1, flush_at=3,
                            spill_dir=str(tmp_path))
    s = pool[0]
    h1 = np.array([11, 22, 11, 33], dtype=np.int64)
    r1 = ray.get(s.admit.remote(777, h1))
    assert r1 == [True, True, False, True]
    # second batch pushes the hot dict past flush_at -> freeze + spill
    assert ray.get(s.admit.remote(
        888, np.array([44, 55, 22], dtype=np.int64))) == [True, True, False]
    assert ray.get(s.n_runs.remote()) == 1
    # two consecutive retries of batch 1, both post-freeze
    assert ray.get(s.admit.remote(777, h1)) == r1
    assert ray.get(s.admit.remote(777, h1)) == r1


def _write_events(tmp_path, uid, ts_us, etype, eid=None, value=None):
    import pyarrow.parquet as pq

    n = len(uid)
    t = pa.table({
        "event_id": pa.array(
            list(range(1, n + 1)) if eid is None else eid, pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(etype, pa.string()),
        "value": pa.array(value or [1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_event_runs_matches_scalar_reference(ray_session, tmp_path):
    """Gaps-and-islands RLE: the lexsort + boundary-diff + reduceat
    kernel must equal the per-user scalar run walk — randomized users
    with REPEATED timestamps (event_id tie-break), single-event runs,
    and a user whose whole stream is one run."""
    import random

    from ocaml_geojson_ray.pipelines.queries import q_event_runs

    rng = random.Random(42)
    uid, ts, et = [], [], []
    for u in range(1, 8):
        for i in range(rng.randint(1, 40)):
            uid.append(u)
            # repeated ts values force the event_id tie-break
            ts.append(1_700_000_000_000_000 + rng.randint(0, 5) * 1000)
            et.append(rng.choice(["a", "b", "c"]))
    uid.append(99)  # single-run user
    ts.append(1_700_000_000_000_000)
    et.append("a")
    sf = _write_events(tmp_path, uid, ts, et)

    # scalar reference: walk each user's (ts, event_id)-ordered stream
    rows = sorted(zip(uid, ts, range(1, len(uid) + 1), et),
                  key=lambda r: (r[0], r[1], r[2]))
    runs = {}
    prev = None
    for u, t, i, e in rows:
        if prev is None or prev[0] != u or prev[1] != e:
            runs.setdefault(e, []).append(1)
        else:
            runs[e][-1] += 1
        prev = (u, e)
    got = {r["event_type"]: r for r in q_event_runs(sf).to_pylist()}
    assert set(got) == set(runs)
    for e, lens in runs.items():
        assert got[e]["n_runs"] == len(lens)
        assert got[e]["n_events"] == sum(lens)
        assert got[e]["max_run"] == max(lens)
        assert got[e]["avg_run"] == sum(lens) / len(lens)


def test_benford_leading_digit_loop_equals_substr(ray_session, tmp_path):
    """The 18-round vectorized d//10 leading-digit device must equal
    str(cents)[0] across magnitudes 1 cent .. ~9e17, and prices whose
    cents round to 0 must fall OUT of the digit-1..9 funnel on both
    sides (n sums to the kept orders only)."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import q_benford_amounts

    prices = [0.004]  # cents -> 0, excluded
    for mag in range(0, 16):
        for lead in (1, 2, 5, 9):
            prices.append(lead * 10 ** mag / 100.0 + 0.001)
    t = pa.table({
        "o_orderkey": pa.array(range(len(prices)), pa.int64()),
        "o_custkey": pa.array([1] * len(prices), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(prices), pa.string()),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([0] * len(prices), pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-X"] * len(prices), pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/orders.parquet")
    out = {r["digit"]: r["n"] for r in
           q_benford_amounts(str(tmp_path)).to_pylist()}

    expect = {d: 0 for d in range(1, 10)}
    for p in prices:
        c = round(p * 100)
        if c >= 1:
            expect[int(str(c)[0])] += 1
    assert out == expect
    assert sum(out.values()) == len(prices) - 1  # the 0-cent row left


def test_autocorr_dense_grid_zero_fill(ray_session, tmp_path):
    """Missing calendar days must enter the series as ZEROS: a
    3-events-then-gap fixture where the gap flips the lag-1 sign vs
    the compacted (gap-dropped) series; pinned against numpy corrcoef
    on the explicit dense grid."""
    from ocaml_geojson_ray.pipelines.queries import q_autocorr_daily

    US = 86_400_000_000
    # days 0,0,0, 2, 4,4 -> dense [3,0,1,0,2]
    day_of = [0, 0, 0, 2, 4, 4]
    sf = _write_events(tmp_path, [1] * 6, [d * US + 5 for d in day_of],
                       ["a"] * 6)
    dense = np.array([3, 0, 1, 0, 2], dtype=np.float64)
    out = {r["lag"]: r for r in q_autocorr_daily(sf).to_pylist()}
    r1 = np.corrcoef(dense[:-1], dense[1:])[0, 1]
    assert abs(out[1]["acf"] - r1) < 1e-12
    assert out[1]["n_pairs"] == 4
    # compacted series would have positive lag-1 here; dense is negative
    assert out[1]["acf"] < 0
    # lag 7 exceeds the 5-day grid: degenerate -> no row (both sides)
    assert set(out) == {1}


def _write_documents(tmp_path, texts, langs=None):
    import pyarrow.parquet as pq

    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_heavy_hitters_mg_gate_prunes_and_stays_exact(ray_session,
                                                      tmp_path):
    """The Misra-Gries gate must PRUNE (vocab 600 ≫ k=200 counters)
    yet the emitted threshold set stays EXACT — equal to the
    brute-force 200·n > N rule, including a word sitting exactly AT
    the boundary (200·n == N ⇒ excluded, strict inequality)."""
    import random

    from ocaml_geojson_ray.pipelines.queries import q_heavy_hitters

    rng = random.Random(7)
    # 3 heavy words + a 600-word noise tail (one occurrence each),
    # padded so N = 1200 exactly, with a word planted AT the boundary
    # (6 occurrences = N/200 -> 200·n == N -> must be EXCLUDED)
    words = (["alpha"] * 300 + ["beta"] * 120 + ["gamma"] * 40
             + [f"w{i:03d}" for i in range(600)]
             + ["pad"] * 134 + ["edge"] * 6)
    n_total = len(words)
    assert n_total == 1200 and 200 * 6 == n_total
    rng.shuffle(words)
    texts = [" ".join(words[i:i + 50]) for i in range(0, len(words), 50)]
    sf = _write_documents(tmp_path, texts)

    out = {r["word"]: r["n"] for r in q_heavy_hitters(sf).to_pylist()}
    from collections import Counter

    truth = Counter(words)
    expect = {w: c for w, c in truth.items() if c * 200 > n_total}
    assert out == expect
    assert "alpha" in out and len(out) < 20  # the gate pruned the tail
    assert "edge" not in out and truth["edge"] * 200 == n_total


def test_lang_vocab_overlap_scalar_reference(ray_session, tmp_path):
    """Pairwise vocab Jaccard must equal per-lang set arithmetic,
    keep ZERO-overlap pairs, and survive words containing \\x00-free
    separators (punctuation, digits, unicode)."""
    from ocaml_geojson_ray.pipelines.queries import q_lang_vocab_overlap

    texts = ["a b c über!", "b c d", "x1 y,2 z", "a über!"]
    langs = ["en", "en", "fr", "de"]
    sf = _write_documents(tmp_path, texts, langs)
    vocab = {"en": {"a", "b", "c", "d", "über!"},
             "fr": {"x1", "y,2", "z"},
             "de": {"a", "über!"}}
    out = {(r["lang_a"], r["lang_b"]): r
           for r in q_lang_vocab_overlap(sf).to_pylist()}
    assert set(out) == {("de", "en"), ("de", "fr"), ("en", "fr")}
    for (la, lb), r in out.items():
        inter = len(vocab[la] & vocab[lb])
        union = len(vocab[la] | vocab[lb])
        assert r["n_inter"] == inter and r["n_union"] == union
        assert r["jaccard"] == inter / union
    assert out[("de", "fr")]["jaccard"] == 0.0  # zero-overlap kept


def test_winsorized_mean_clamps_tails(ray_session, tmp_path):
    """Winsorized mean: one whale and one deep-negative account must
    be clamped to the p05/p95 grid values (quantile_disc rule), and
    the mean must equal the clamped-cents sum / n exactly."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import q_winsorized_mean

    bals = [-9999.99] + [float(i) for i in range(1, 99)] + [50000.0]
    t = pa.table({
        "c_custkey": pa.array(range(len(bals)), pa.int64()),
        "c_name": pa.array(["c"] * len(bals), pa.string()),
        "c_nationkey": pa.array([0] * len(bals), pa.int32()),
        "c_acctbal": pa.array(bals, pa.float64()),
        "c_mktsegment": pa.array(["SEG"] * len(bals), pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/customer.parquet")
    out = q_winsorized_mean(str(tmp_path)).to_pylist()
    assert len(out) == 1
    r = out[0]
    cents = sorted(round(b * 100) for b in bals)
    n = len(cents)
    lo = cents[max(0, -(-5 * n // 100) - 1)]     # ceil(0.05n)-1
    hi = cents[max(0, -(-95 * n // 100) - 1)]    # ceil(0.95n)-1
    sc = sum(min(max(c, lo), hi) for c in cents)
    assert (r["lo_cents"], r["hi_cents"]) == (lo, hi)
    assert r["sum_clamped"] == sc and r["n"] == n
    assert r["wmean"] == sc / n
    assert r["hi_cents"] < 5000000  # the whale got clamped


def test_rollup_revenue_levels_consistent(ray_session, tmp_path):
    """ROLLUP: nation rows must re-sum to their region subtotal and
    the grand total; an order whose custkey has no customer row DROPS
    (inner-join semantics, guarded searchsorted probe)."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import q_rollup_revenue

    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["EAST", "WEST"], pa.string()),
    }), f"{tmp_path}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([10, 11, 12], pa.int64()),
        "n_name": pa.array(["A", "B", "C"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), f"{tmp_path}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["x", "y", "z"], pa.string()),
        "c_nationkey": pa.array([10, 11, 12], pa.int32()),
        "c_acctbal": pa.array([0.0] * 3, pa.float64()),
        "c_mktsegment": pa.array(["S"] * 3, pa.string()),
    }), f"{tmp_path}/customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3, 999], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5, pa.string()),
        "o_totalprice": pa.array([10.0, 5.5, 2.25, 100.0, 777.0],
                                 pa.float64()),
        "o_orderdate": pa.array([0] * 5, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 5, pa.string()),
    }), f"{tmp_path}/orders.parquet")

    out = {(r["region"], r["nation"]): r["revenue_cents"]
           for r in q_rollup_revenue(str(tmp_path)).to_pylist()}
    assert out[("EAST", "A")] == 1550 and out[("EAST", "B")] == 225
    assert out[("WEST", "C")] == 10000
    assert out[("EAST", "ALL")] == 1775          # nations re-sum
    assert out[("WEST", "ALL")] == 10000
    assert out[("ALL", "ALL")] == 11775          # custkey 999 dropped
    assert len(out) == 6


def test_ecdf_probes_boundary_inclusive(ray_session, tmp_path):
    """A value exactly AT a probe must count into n_le (<=, not <)."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import q_ecdf_probes

    # one order exactly at the $1,000 probe, one below, two above
    prices = [1000.00, 999.99, 1000.01, 45000.0]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1] * 4, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 4, pa.string()),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string()),
    }), f"{tmp_path}/orders.parquet")
    out = {r["probe_cents"]: r for r in
           q_ecdf_probes(str(tmp_path)).to_pylist()}
    assert out[100000]["n_le"] == 2          # 999.99 and 1000.00
    assert out[100000]["ecdf"] == 2 / 4
    assert out[500000]["n_le"] == 3          # all but the $45k order
    assert out[4000000]["n_le"] == 3         # $45k still above $40k
    assert out[5000000]["n_le"] == 4         # ... and within $50k


def test_theilsen_robust_to_outlier(ray_session, tmp_path):
    """Theil–Sen median slope must shrug off one spike day that drags
    OLS; both pinned against direct numpy references."""
    from ocaml_geojson_ray.pipelines.queries import q_theilsen_trend

    US = 86_400_000_000
    # daily counts: 1,2,3,4,50,6,7,8 (day 4 is a spike)
    counts = [1, 2, 3, 4, 50, 6, 7, 8]
    uid, ts, et = [], [], []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            uid.append(1)
            ts.append(d * US + eid)
            et.append("a")
    sf = _write_events(tmp_path, uid, ts, et)
    r = q_theilsen_trend(sf).to_pylist()[0]
    g = np.array(counts, dtype=np.int64)
    D = len(g)
    i, j = np.triu_indices(D, k=1)
    slopes = np.sort((g[j] - g[i]).astype(np.float64) / (j - i))
    med = slopes[int(np.ceil(0.5 * len(slopes))) - 1]
    assert r["n_days"] == D and r["n_pairs"] == len(slopes)
    assert r["ts_slope"] == med
    x = np.arange(D)
    ols = (D * (x * g).sum() - x.sum() * g.sum()) / \
        (D * (x * x).sum() - x.sum() ** 2)
    assert abs(r["ols_slope"] - ols) < 1e-12
    assert abs(r["ts_slope"] - 1.0) <= 0.5 and r["ols_slope"] > 1.5


def test_active_streaks_islands_and_gaps(ray_session, tmp_path):
    """Streak detection: multi-event days collapse, a 1-day gap
    breaks the streak, and the histogram counts each user's MAX
    streak exactly once."""
    from ocaml_geojson_ray.pipelines.queries import q_active_streaks

    US = 86_400_000_000
    rows = []  # (user, day) with duplicates
    rows += [(1, d) for d in (0, 0, 1, 2, 4, 5)]      # max streak 3
    rows += [(2, d) for d in (10,)]                   # max streak 1
    rows += [(3, d) for d in (0, 2, 4, 6)]            # max streak 1
    rows += [(4, d) for d in (7, 8, 9, 10, 11)]       # max streak 5
    sf = _write_events(tmp_path, [u for u, _ in rows],
                       [d * US + 1 for _, d in rows],
                       ["a"] * len(rows))
    out = {r["max_streak"]: r["n_users"]
           for r in q_active_streaks(sf).take_all()}
    assert out == {3: 1, 1: 2, 5: 1}


def test_weighted_median_price_weight_pull(ray_session, tmp_path):
    """The weighted median must move with quantity weights: one huge-
    quantity cheap line outweighs many expensive unit lines; ties on
    2·cum == tot pick the LOWER value (definitional rule)."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import \
        q_weighted_median_price

    # flag A: price 1.00 × qty 10 vs five price-9.00 × qty 1 lines
    #   -> total weight 15, cum at 1.00 is 10, 2*10 >= 15 -> median 100
    # flag B: 2.00×2 and 4.00×2 -> tot 4, at 2.00 cum=2, 2*2>=4 ->
    #   LOWER value 200 picked on the exact tie
    prices = [1.0] + [9.0] * 5 + [2.0, 4.0]
    qtys = [10.0] + [1.0] * 5 + [2.0, 2.0]
    flags = ["A"] * 6 + ["B"] * 2
    n = len(prices)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array(qtys, pa.float64()),
        "l_extendedprice": pa.array(prices, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(flags, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), f"{tmp_path}/lineitem.parquet")
    out = {r["l_returnflag"]: r for r in
           q_weighted_median_price(str(tmp_path)).to_pylist()}
    assert out["A"]["wmedian_cents"] == 100
    assert out["A"]["total_weight"] == 15
    assert out["B"]["wmedian_cents"] == 200  # exact-tie lower pick
    assert out["B"]["total_weight"] == 4


def test_crosscorr_types_sign_and_alignment(ray_session, tmp_path):
    """Cross-correlation: anti-phased series must give r = −1 on the
    shared dense grid, and a type active on DIFFERENT days than
    another still aligns via zero fill (pinned vs numpy corrcoef)."""
    from ocaml_geojson_ray.pipelines.queries import q_crosscorr_types

    US = 86_400_000_000
    rows = []
    a = [3, 1, 3, 1, 3, 1]
    b = [1, 3, 1, 3, 1, 3]
    for d in range(6):
        rows += [("up", d)] * a[d] + [("down", d)] * b[d]
    rows += [("sparse", 0)] * 2 + [("sparse", 5)] * 2
    sf = _write_events(tmp_path, [1] * len(rows),
                       [d * US + i for i, (_, d) in enumerate(rows)],
                       [t for t, _ in rows])
    out = {(r["type_a"], r["type_b"]): r["r"]
           for r in q_crosscorr_types(sf).to_pylist()}
    assert abs(out[("down", "up")] + 1.0) < 1e-12
    sparse = np.array([2, 0, 0, 0, 0, 2], dtype=np.float64)
    ref = np.corrcoef(sparse, np.array(a, dtype=np.float64))[0, 1]
    assert abs(out[("sparse", "up")] - ref) < 1e-12


def test_modal_value_tie_breaks_low(ray_session, tmp_path):
    """Mode tie (two values at equal top count) must pick the LOWER
    cents value."""
    from ocaml_geojson_ray.pipelines.queries import q_modal_value

    vals = [5.00, 5.00, 3.00, 3.00, 9.99]
    sf = _write_events(tmp_path, [1] * 5,
                       [1_700_000_000_000_000 + i for i in range(5)],
                       ["t"] * 5, value=vals)
    r = q_modal_value(sf).to_pylist()[0]
    assert r["mode_cents"] == 300 and r["n_mode"] == 2
    assert r["n_total"] == 5 and r["share"] == 2 / 5


def test_contingency_grid_keeps_zero_cells(ray_session, tmp_path):
    """The type×7 grid must include dows with zero observations, and
    cell terms must sum to the scipy-style chi2 (computed here by
    hand on a 2×7)."""
    from ocaml_geojson_ray.pipelines.queries import \
        q_contingency_type_dow

    US = 86_400_000_000
    # Thursday epoch day 0 -> dow 4. Plant events on dows {4,5} only.
    rows = [("a", 0)] * 6 + [("a", 1)] * 2 + [("b", 0)] * 2 \
        + [("b", 1)] * 6
    sf = _write_events(tmp_path, [1] * len(rows),
                       [d * US + i for i, (_, d) in enumerate(rows)],
                       [t for t, _ in rows])
    out = q_contingency_type_dow(sf).to_pylist()
    # zero-MARGINAL dows are dropped; within kept dows, zero CELLS
    # would stay — here the 2×2 block is fully populated
    assert len(out) == 4 and {r["dow"] for r in out} == {4, 5}
    cells = {(r["event_type"], r["dow"]): r for r in out}
    assert cells[("a", 4)]["n"] == 6 and cells[("b", 5)]["n"] == 6
    # hand chi2 on the 2×2 block (marginals 8/8 × 8/8, N=16 -> e=4)
    chi2 = sum(r["chi_term"] for r in out)
    exp = sum((o - 4.0) ** 2 / 4.0 for o in (6, 2, 2, 6))
    assert abs(chi2 - exp) < 1e-12


def test_first_last_matrix_boundaries(ray_session, tmp_path):
    """First/last extraction: a single-event user maps to the
    diagonal; ts ties at the boundary resolve by event_id."""
    from ocaml_geojson_ray.pipelines.queries import q_first_last_matrix

    T = 1_700_000_000_000_000
    uid = [1, 1, 1, 2, 3, 3]
    ts = [T, T + 5, T + 9, T, T, T]      # user 3: tie on ts
    et = ["a", "b", "c", "d", "x", "y"]  # -> eid order decides x->y
    sf = _write_events(tmp_path, uid, ts, et)
    out = {(r["first_type"], r["last_type"]): r["n_users"]
           for r in q_first_last_matrix(sf).to_pylist()}
    assert out == {("a", "c"): 1, ("d", "d"): 1, ("x", "y"): 1}


def test_bfs_levels_chain_graph(ray_session, tmp_path):
    """BFS on a planted PATH graph (p1-s1-p2-s2-p3 ...) must produce
    one node per level, stop at the 6-hop cap, and leave the
    disconnected island (p90-s90) out entirely."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import q_bfs_levels

    # chain: part i joined to supplier i and supplier i-1 -> a path
    parts, supps = [], []
    for i in range(1, 7):
        parts.append(i), supps.append(i)
        if i > 1:
            parts.append(i), supps.append(i - 1)
    parts.append(90), supps.append(90)  # island (never reached)
    n = len(parts)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_partkey": pa.array(parts, pa.int64()),
        "l_suppkey": pa.array(supps, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array([1.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["A"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), f"{tmp_path}/lineitem.parquet")
    out = {r["lvl"]: r["n_nodes"]
           for r in q_bfs_levels(str(tmp_path)).to_pylist()}
    # path p1 s1 p2 s2 p3 s3 p4 ... : levels 0..6 one node each,
    # nodes beyond the cap (s4-p5-s5-p6-s6 tail past hop 6) cut
    assert out == {k: 1 for k in range(7)}


def test_wow_growth_zero_baseline_drops(ray_session, tmp_path):
    """A week following an EMPTY week has no growth row (undefined
    baseline), while an n=0 week after an active one appears with
    growth −1.0."""
    from ocaml_geojson_ray.pipelines.queries import q_wow_growth

    US_W = 7 * 86_400_000_000
    # weeks 0:4 events, 1:2, 2:0, 3:5  -> rows for weeks 1 (-0.5),
    # 2 (-1.0), and week 3 DROPPED (prev 0)
    weeks = [0] * 4 + [1] * 2 + [3] * 5
    sf = _write_events(tmp_path, [1] * len(weeks),
                       [w * US_W + i for i, w in enumerate(weeks)],
                       ["a"] * len(weeks))
    out = {r["week"]: r for r in q_wow_growth(sf).to_pylist()}
    assert set(out) == {1, 2}
    assert out[1]["growth"] == -0.5 and out[1]["prev_n"] == 4
    assert out[2]["n"] == 0 and out[2]["growth"] == -1.0


def test_user_churn_sets_triad_balances(ray_session, tmp_path):
    """new + retained == active, churned(w) == active(w−1) −
    retained(w), and a fully-silent week still shows its churn."""
    from ocaml_geojson_ray.pipelines.queries import q_user_churn_sets

    US_W = 7 * 86_400_000_000
    pairs = [(1, 0), (2, 0), (3, 0),          # week 0: {1,2,3}
             (1, 1), (4, 1),                  # week 1: {1,4}
             (4, 3)]                          # week 3: {4} (gap at 2)
    sf = _write_events(tmp_path, [u for u, _ in pairs],
                       [w * US_W + i for i, (_, w) in enumerate(pairs)],
                       ["a"] * len(pairs))
    out = {r["week"]: r for r in q_user_churn_sets(sf).to_pylist()}
    w1 = out[1]
    assert (w1["n_active"], w1["n_new"], w1["n_retained"],
            w1["n_churned"]) == (2, 1, 1, 2)   # 4 new, 1 kept, 2+3 left
    w2 = out[2]                                # silent week: churn only
    assert (w2["n_active"], w2["n_churned"]) == (0, 2)
    w4 = out[4]                                # spill week after last
    assert (w4["n_active"], w4["n_churned"]) == (0, 1)
    for r in out.values():
        assert r["n_new"] + r["n_retained"] == r["n_active"]


def test_nation_revenue_rank_tie_semantics(ray_session, tmp_path):
    """rank must SKIP after a tie (competition), dense_rank must not,
    percent_rank = (rank−1)/(N−1) — pinned on planted tied revenues."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import q_nation_revenue_rank

    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2, 3], pa.int64()),
        "n_name": pa.array(["N0", "N1", "N2", "N3"], pa.string()),
        "n_regionkey": pa.array([0] * 4, pa.int64()),
    }), f"{tmp_path}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["a"] * 4, pa.string()),
        "c_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
        "c_acctbal": pa.array([0.0] * 4, pa.float64()),
        "c_mktsegment": pa.array(["S"] * 4, pa.string()),
    }), f"{tmp_path}/customer.parquet")
    # revenues: N0=100, N1=50, N2=50, N3=10 -> ranks 1,2,2,4
    prices = {1: [100.0], 2: [50.0], 3: [30.0, 20.0], 4: [10.0]}
    ok, cks, ps = [], [], []
    i = 0
    for ck, lst in prices.items():
        for p in lst:
            i += 1
            ok.append(i), cks.append(ck), ps.append(p)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_custkey": pa.array(cks, pa.int64()),
        "o_orderstatus": pa.array(["O"] * i, pa.string()),
        "o_totalprice": pa.array(ps, pa.float64()),
        "o_orderdate": pa.array([0] * i, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * i, pa.string()),
    }), f"{tmp_path}/orders.parquet")
    out = {r["nation"]: r for r in
           q_nation_revenue_rank(str(tmp_path)).to_pylist()}
    assert [out[n]["rnk"] for n in ("N0", "N1", "N2", "N3")] \
        == [1, 2, 2, 4]
    assert [out[n]["dense_rnk"] for n in ("N0", "N1", "N2", "N3")] \
        == [1, 2, 2, 3]
    assert out["N3"]["pct_rnk"] == 1.0 and out["N0"]["pct_rnk"] == 0.0
    assert out["N1"]["pct_rnk"] == out["N2"]["pct_rnk"] == 1 / 3


def test_orders_pagination_stable_page(ray_session, tmp_path):
    """Page 3 (rows 41-60) must be exact under price ties — orderkey
    breaks them — and the per-block top-60 funnel must not lose a
    row that belongs on the page."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import q_orders_pagination

    # 100 orders, prices descending in pairs (ties), keys shuffled
    n = 100
    keys = list(range(1, n + 1))
    prices = [float(1000 - (k // 2)) for k in keys]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_orderstatus": pa.array(["O"] * n, pa.string()),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([0] * n, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * n, pa.string()),
    }), f"{tmp_path}/orders.parquet")
    ref = sorted(zip(prices, keys), key=lambda r: (-r[0], r[1]))[40:60]
    out = q_orders_pagination(str(tmp_path)).to_pylist()
    assert [r["o_orderkey"] for r in out] == [k for _, k in ref]
    assert out[0]["page_pos"] == 41 and out[-1]["page_pos"] == 60


def test_above_avg_orders_integer_predicate(ray_session, tmp_path):
    """price > customer mean must use the EXACT integer
    cross-multiply: a customer with orders [1.00, 2.00, 2.00] has
    mean 5/3 — both 2.00s count, the 1.00 doesn't, and an order
    exactly AT the mean (customer [2.00, 4.00], probe 3.00) is NOT
    above."""
    import pyarrow.parquet as pq

    from ocaml_geojson_ray.pipelines.queries import q_above_avg_orders

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"], pa.string()),
        "c_nationkey": pa.array([0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["X", "Y"], pa.string()),
    }), f"{tmp_path}/customer.parquet")
    cks = [1, 1, 1, 2, 2, 2]
    ps = [1.0, 2.0, 2.0, 2.0, 4.0, 3.0]  # cust2 mean exactly 3.00
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(6), pa.int64()),
        "o_custkey": pa.array(cks, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 6, pa.string()),
        "o_totalprice": pa.array(ps, pa.float64()),
        "o_orderdate": pa.array([0] * 6, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 6, pa.string()),
    }), f"{tmp_path}/orders.parquet")
    out = {r["c_mktsegment"]: r for r in
           q_above_avg_orders(str(tmp_path)).to_pylist()}
    assert out["X"]["n_above"] == 2 and out["X"]["n_orders"] == 3
    assert out["Y"]["n_above"] == 1  # only the 4.00; 3.00 == mean


def test_block_rank_offsets_device(ray_session):
    """util.block_rank_offsets is THE distributed row_number device
    (systematic_sample; rfm-style global NTILE). Its two load-bearing
    assumptions are Ray-version-sensitive and pinned here: (a) sorted
    blocks hold disjoint key ranges so per-block counts fold into
    exact global offsets; (b) ``batch_size=None`` map_batches over the
    SAME materialized dataset yields one batch per block, so every
    batch's first key hits the offset map."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ocaml_geojson_ray.util import block_rank_offsets

    rng = np.random.default_rng(7)
    k1 = rng.permutation(997).astype(np.int64)
    k2 = rng.integers(0, 1 << 40, 997).astype(np.int64)
    ds = rd.from_arrow(pa.table({"a": k1, "b": k2})) \
        .repartition(8)
    mat = ds.sort(["a", "b"]).materialize()
    offsets, total = block_rank_offsets(mat, ["a", "b"])
    assert total == 997
    off_ref = ray.put(offsets)

    def ranks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "rk": pa.array([], pa.int64())})
        off = ray.get(off_ref)[(b["a"][0].as_py(), b["b"][0].as_py())]
        return pa.table({
            "a": b["a"],
            "rk": pa.array(off + np.arange(b.num_rows, dtype=np.int64),
                           pa.int64()),
        })

    out = pa.concat_tables(ray.get(
        mat.map_batches(ranks, batch_format="pyarrow",
                        batch_size=None).to_arrow_refs()))
    a = out["a"].to_numpy(zero_copy_only=False)
    rk = out["rk"].to_numpy(zero_copy_only=False)
    assert sorted(rk.tolist()) == list(range(997))
    # keys are unique on 'a' alone here, so rank order == a order
    a_by_rank = a[np.argsort(rk)]
    assert (np.sort(a) == a_by_rank).all()
