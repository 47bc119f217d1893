"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Per-row invariant (the north rule's "byte-identical extracted text per
url"): ``stages.extract.extract_text_from_html(html) == text`` exactly.
The page html embeds the text paragraphs with HTML escaping; a fraction
of pages also embed GeoJSON documents — valid ones from the ported
``Random`` generator (reference: src/geojson/geojson.ml:625-678),
fixture-shaped ones, and invalid ones drawn from the reference's error
branches (SURVEY.md §1.3) — both inline in the text and inside a
``<script type="application/geo+json">`` tag.

Generation is Ray-Data-native and sharded: ``ray.data.range(n)`` →
``map_batches(PageBuilder)`` so a 10^12-row table is just a bigger
range with the same per-row determinism (seed ⊕ page_id), never a
driver-side loop.
"""

from __future__ import annotations

import html as html_mod
import os

import numpy as np
import pyarrow as pa

from ..core.jsontext import dumps_json
from ..core.random_gen import random as gj_random
from ..core.serialize import to_text

# vocabulary for deterministic filler prose
_WORDS = (
    "map atlas region commune boundary census river city town survey "
    "elevation district parcel road terrain county island coast basin "
    "plain valley ridge harbor bridge ferry trail park forest lake"
).split()

_LANGS = ("en", "fr", "de", "es", "pt", "it", "nl", "pl")

# invalid-document corpus embedded in pages (FIXTURES.md §3). Note:
# only docs carrying a *recognized* GeoJSON type token are embeddable —
# docs with no "type", or an unknown type string (e.g. "Circle"), are
# invisible to any type-token text miner; those verdicts are covered by
# the direct parser tests instead.
# fixed valid docs (fixture-shaped, reference corpus): embedding these
# verbatim across many pages creates REAL cross-page duplicates for the
# dedup operators (N8) to find
_FIXTURE_DOCS = (
    '{"type":"Point","coordinates":[125.6,10.1]}',
    '{"type":"LineString","coordinates":[[100,0],[101,1]]}',
    '{"type":"Polygon","coordinates":[[[100,0],[101,0],[101,1],[100,1],[100,0]]]}',
    '{"type":"Feature","geometry":{"type":"MultiPoint","coordinates":[[125.1,40],[155.9,22.5]]},"properties":{"name":"Dinagat Islands"},"title":"Some Islands"}',
)

_INVALID_DOCS = (
    '{"type":"Point"}',
    '{"type":"LineString","coordinates":[[0,0]]}',
    '{"type":"Feature","geometry":null,"properties":{}}',
    '{"type":"Feature","id":[1],"geometry":{"type":"Point","coordinates":[0,0]}}',
    '{"type":"FeatureCollection"}',
    '{"type":"GeometryCollection"}',
    '{"type":"Point","coordinates":["a",0]}',
)

# lexically broken but RECOVERABLE under the streaming lexer's U+FFFD
# splices (jsone.ml:327-420; core/jsontext.recover_json_text): bad
# escape, raw control char, bad \u hex. Real-web mined JSON hits these
# constantly — they parse ok=True with recovered=True.
_RECOVERABLE_DOCS = (
    '{"type":"Feature","geometry":{"type":"Point","coordinates":[7.1,46.2]},'
    '"properties":{"name":"z\\qrich"}}',
    '{"type":"Feature","geometry":{"type":"Point","coordinates":[2.35,48.86]},'
    '"properties":{"note":"tab\tchar"}}',
    '{"type":"Point","coordinates":[13.4,52.5],"label":"bad \\u12G4 hex"}',
)


GENERATOR_VERSION = 5  # bump when page content changes → new cache dir


def page_count_for_sf(sf: float) -> int:
    """~500k pages per unit scale factor (sf0.1 → 50k pages)."""
    return max(100, int(sf * 500_000))


def pages_parquet_path(sf: float, root: str = "/tmp/ogr_data") -> str:
    return os.path.join(root, f"pages_sf{sf}_v{GENERATOR_VERSION}")


def _geojson_skeleton(rng: np.random.Generator):
    """Random document skeleton in the reference's Random shapes."""
    kind = rng.integers(0, 4)
    geoms = [
        ("Point",),
        ("MultiPoint", int(rng.integers(1, 5))),
        ("LineString", int(rng.integers(2, 8))),
        ("Polygon", int(rng.integers(4, 12))),
        ("MultiPolygon", int(rng.integers(1, 3)), int(rng.integers(4, 8))),
        ("Collection", [("Point",), ("LineString", int(rng.integers(2, 5)))]),
    ]
    g = geoms[int(rng.integers(0, len(geoms)))]
    if kind == 0:
        return ("G", g)
    if kind == 1:
        return ("F", {"properties": {"name": _rand_word(rng)}, "geometry": g})
    nfeat = int(rng.integers(1, 6))
    return (
        "FC",
        [
            {
                "properties": {"name": _rand_word(rng), "code": float(rng.integers(0, 99999))},
                "geometry": geoms[int(rng.integers(0, len(geoms)))],
            }
            for _ in range(nfeat)
        ],
    )


def _rand_word(rng) -> str:
    return _WORDS[int(rng.integers(0, len(_WORDS)))]


def _rand_sentence(rng) -> str:
    n = int(rng.integers(4, 14))
    idx = rng.integers(0, len(_WORDS), size=n)
    return " ".join(_WORDS[i] for i in idx) + "."


def build_page(page_id: int, seed: int = 42):
    """One deterministic page: (url, warc_ts_us, html_bytes, text, lang,
    n_embedded_valid, n_embedded_invalid)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, page_id]))
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
    url = f"https://site{page_id % 1000}.example.org/{lang}/page/{page_id}"
    # spread over a year of 2024, microsecond precision
    warc_ts_us = 1_704_067_200_000_000 + int(rng.integers(0, 366 * 86_400)) * 1_000_000

    paras = [_rand_sentence(rng) for _ in range(int(rng.integers(2, 7)))]
    n_valid = 0
    n_invalid = 0
    # ~60% of pages embed 1-3 GeoJSON docs in the text
    if rng.random() < 0.6:
        for _ in range(int(rng.integers(1, 4))):
            roll = rng.random()
            if roll < 0.15:
                # a fixed fixture doc → deliberate cross-page duplicate
                doc = _FIXTURE_DOCS[int(rng.integers(0, len(_FIXTURE_DOCS)))]
                n_valid += 1
                pos = int(rng.integers(0, len(paras) + 1))
                paras.insert(pos, doc)
                continue
            if roll < 0.875:
                skel = _geojson_skeleton(rng)
                # local geometries: all positions of one document jitter
                # around a per-document center (admin-boundary-like).
                # Globally-uniform vertices make envelopes span the
                # planet and explode tile covers pathologically.
                clng = float(rng.uniform(-175.0, 175.0))
                clat = float(rng.uniform(-70.0, 70.0))
                draw_n = [0]

                def f() -> float:
                    # random_gen draws lat first, then lng, per position
                    # (geojson.ml:669-670) — track parity to center each
                    is_lat = draw_n[0] % 2 == 0
                    draw_n[0] += 1
                    c = clat if is_lat else clng
                    lim = 89.9 if is_lat else 179.9
                    v = np.clip(c + rng.uniform(-1.0, 1.0), -lim, lim)
                    return float(np.round(v, 5))

                doc = to_text(gj_random(f, skel))
                n_valid += 1
            elif roll < 0.92:
                # lexically broken but recoverable → ok=True, recovered
                doc = _RECOVERABLE_DOCS[int(rng.integers(0, len(_RECOVERABLE_DOCS)))]
                n_valid += 1
            else:
                doc = _INVALID_DOCS[int(rng.integers(0, len(_INVALID_DOCS)))]
                n_invalid += 1
            pos = int(rng.integers(0, len(paras) + 1))
            paras.insert(pos, doc)
    text = "\n".join(paras)

    body = "".join(f"<p>{html_mod.escape(p)}</p>" for p in paras)
    script = ""
    if n_valid and rng.random() < 0.5:
        # a geo+json script block NOT part of the text channel
        script = (
            '<script type="application/geo+json">'
            + dumps_json(
                {"type": "Point", "coordinates": [float(np.round(rng.uniform(-180, 180), 5)), float(np.round(rng.uniform(-90, 90), 5))]}
            )
            + "</script>"
        )
    page_html = (
        f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>page {page_id}</title></head><body>{body}{script}</body></html>"
    ).encode("utf-8")
    return url, warc_ts_us, page_html, text, lang, n_valid, n_invalid


class PageBuilder:
    """Actor-pool batch builder: ``ray.data.range(n).map_batches(PageBuilder)``.

    Stateless math per row but class-shaped so the template strings and
    RNG machinery are warm per actor.
    """

    def __init__(self, seed: int = 42):
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for pid in ids:
            url, ts, h, t, lang, _, _ = build_page(int(pid), self.seed)
            urls.append(url)
            tss.append(ts)
            htmls.append(h)
            texts.append(t)
            langs.append(lang)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )


def generate_pages_dataset(n_pages: int, seed: int = 42, parallelism: int = -1):
    """Lazy Dataset of n_pages synthetic pages."""
    import ray.data as rd

    ds = rd.range(n_pages, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(PageBuilder(seed), batch_format="pyarrow", batch_size=2048)


def materialize_pages_parquet(
    sf: float, root: str = "/tmp/ogr_data", seed: int = 42, force: bool = False
) -> str:
    """Write (once) the pages table for a scale factor; resumable reuse.

    Partitioned parquet directory + a _SUCCESS marker so repeated bench
    runs skip generation (N10 resumable-output layout).
    """
    out = pages_parquet_path(sf, root)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return out
    n = page_count_for_sf(sf)
    os.makedirs(out, exist_ok=True)
    nblocks = max(8, min(64, n // 2048))
    # ~1k rows per file so the READ parallelizes (a 2-file table caps
    # the whole pipeline at 2 read tasks regardless of cluster size)
    generate_pages_dataset(n, seed, parallelism=nblocks).write_parquet(
        out, max_rows_per_file=1024, min_rows_per_file=256
    )
    with open(marker, "w") as fh:
        fh.write(f"{n}\n")
    return out
