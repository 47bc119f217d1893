"""Great-circle radius self-join (distance-predicate spatial join).

The missing member of the join family (rect PIP join, envelope join,
kNN, interval/as-of): *all pairs of points within a geodesic radius*.
Reference anchor: the north star's N5 cell-bucketed join
(SURVEY.md §2.2) — this is the distance-predicate variant a geo user
reaches for right after containment.

Oracle-parity design (the device proven by ``s2_latlng_to_cell_parity``,
spatial/cells.py:194): raw libm trig is NOT bit-portable across
engines, so each point's unit-sphere vector is quantized ONCE with
``q = floor(trig · 10⁷ + 0.5)`` (int64) — after that single step the
*entire* predicate is integer arithmetic, identical in numpy and
DuckDB by construction:

    chord2(a, b) = (qxa−qxb)² + (qya−qyb)² + (qza−qzb)²   (int64)
    pair kept  ⇔  chord2 ≤ T²

T is the chord length (scaled by 10⁷) subtended by the angular radius
θ: T = round(2·sin(θ/2)·10⁷). At 10⁷ scale the quantization error is
~1 cm on the unit Earth — the predicate is exact for the corpus's
0.01° point grid and, unlike a haversine-in-floats comparison, has
ZERO cross-engine boundary risk (both engines compare the same ints).

Physical plan (one key shuffle, each pair emitted EXACTLY once):
points land in a lng/lat grid sized so the radius never spans more
than one neighbor ring; every point is emitted once as *home* in its
own cell and once as *probe* into the four FORWARD neighbors
(E, N, NE, NW). For any two cells at offset δ in the 8-neighborhood,
exactly one of {δ, −δ} is a forward offset, so a cross-cell pair
meets in exactly one group (home×probe) and a same-cell pair in
exactly one (home×home, deduped by key order). No global distinct
pass, no all-pairs: per-group work is |home|·|group| with groups
bounded by the grid density (hot cells would recurse via the
spatial/skew.py split — not needed on this corpus, documented).

Scale notes: the 5× row duplication ships 4 int64s per copy; the
shuffle key is the grid cell, so skew follows point density (salt via
skew.py if a city-scale hotspot appears). The latitude band is
|lat| < 60° BY DERIVATION (the synthetic points are generated into
the band), which keeps the 2°-lng × 1°-lat cells ≥ the radius in
ground distance — a production all-latitude variant switches to a
polar-cap cell at |lat| ≥ 60 (one extra bucket, same plan).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Angular radius 7° (regional pairing, ≈ 780 km): chord units
# T = round(2·sin(3.5°)·1e7). Sized so even the 150-point sf0.001
# fixture yields pairs (its nearest pair is 6.63° apart). Worst-case
# spread of an in-radius pair inside the |lat| < 60 band:
# Δλ ≤ 2·asin(sin(3.5°)/cos(59.99°)) = 14.03° < the 15° lng cell,
# Δφ ≤ 7.01° < the 7.5° lat cell — the forward-neighbor ring is
# sufficient with real margin on both axes.
CHORD_T = 1220971
_T2 = CHORD_T * CHORD_T

_NX = 24  # 15° lng cells, wraparound ring
_FORWARD = ((1, 0), (0, 1), (1, 1), (-1, 1))  # E, N, NE, NW


def quantized_sphere(lng: np.ndarray, lat: np.ndarray):
    """(qx, qy, qz) int64 — floor(unit-vector · 10⁷ + 0.5), the
    bit-portable quantization shared with s2_latlng_to_cell_parity."""
    lngr = np.radians(np.asarray(lng, dtype=np.float64))
    latr = np.radians(np.asarray(lat, dtype=np.float64))
    S = 1e7
    qx = np.floor(np.cos(latr) * np.cos(lngr) * S + 0.5).astype(np.int64)
    qy = np.floor(np.cos(latr) * np.sin(lngr) * S + 0.5).astype(np.int64)
    qz = np.floor(np.sin(latr) * S + 0.5).astype(np.int64)
    return qx, qy, qz


def grid_duplicate_batch(batch: pa.Table, key_col: str = "key") -> pa.Table:
    """Map side: quantize + emit home row and 4 forward-probe copies.

    Cell geometry: x = floor((lng+180)/15) ∈ [0,24), wraps mod 24;
    y = floor((lat+60)/7.5) ∈ [0,16). Grid placement is engine-internal
    (the oracle is brute force), so a 1-ulp floor flip at a cell edge
    is harmless — the point still meets every in-radius partner via
    the neighbor ring.
    """
    key = batch[key_col].to_numpy()
    lng = batch["lng"].to_numpy()
    lat = batch["lat"].to_numpy()
    qx, qy, qz = quantized_sphere(lng, lat)
    xc = np.floor((lng + 180.0) / 15.0).astype(np.int64) % _NX
    yc = np.floor((lat + 60.0) / 7.5).astype(np.int64)

    n = len(key)
    reps = 1 + len(_FORWARD)
    cells = np.empty(n * reps, dtype=np.int64)
    home = np.zeros(n * reps, dtype=bool)
    cells[:n] = yc * _NX + xc
    home[:n] = True
    for i, (dx, dy) in enumerate(_FORWARD):
        s = n * (i + 1)
        cells[s:s + n] = (yc + dy) * _NX + (xc + dx) % _NX
    tile = lambda a: np.tile(a, reps)  # noqa: E731
    return pa.table({
        "cell": pa.array(cells, pa.int64()),
        "key": pa.array(tile(key), pa.int64()),
        "qx": pa.array(tile(qx), pa.int64()),
        "qy": pa.array(tile(qy), pa.int64()),
        "qz": pa.array(tile(qz), pa.int64()),
        "home": pa.array(home, pa.bool_()),
    })


def cell_pairs(group: pa.Table) -> pa.Table:
    """Reduce side (one grid cell): all in-radius pairs touching this
    cell, each emitted once — home×home deduped by key order,
    home×probe as-is (the forward-offset construction guarantees the
    partner cell never emits the mirror)."""
    key = group["key"].to_numpy()
    qx = group["qx"].to_numpy()
    qy = group["qy"].to_numpy()
    qz = group["qz"].to_numpy()
    home = group["home"].to_numpy(zero_copy_only=False)
    h = np.flatnonzero(home)
    if len(h) == 0:
        return _EMPTY
    # (|home| × |group|) int64 distance block; groups are grid-bounded
    dx = qx[h][:, None] - qx[None, :]
    dy = qy[h][:, None] - qy[None, :]
    dz = qz[h][:, None] - qz[None, :]
    d2 = dx * dx + dy * dy + dz * dz
    within = d2 <= _T2
    # home targets: key-order dedup (strict < also kills self-pairs);
    # probe targets: always (cross-cell pair, seen only here)
    kh = key[h]
    sel = within & np.where(home[None, :], kh[:, None] < key[None, :], True)
    ii, jj = np.nonzero(sel)
    a = np.minimum(kh[ii], key[jj])
    b = np.maximum(kh[ii], key[jj])
    return pa.table({
        "a_key": pa.array(a, pa.int64()),
        "b_key": pa.array(b, pa.int64()),
        "chord2": pa.array(d2[ii, jj], pa.int64()),
    })


_EMPTY = pa.table({
    "a_key": pa.array([], pa.int64()),
    "b_key": pa.array([], pa.int64()),
    "chord2": pa.array([], pa.int64()),
})


def geo_distance_pairs(ds, key_col: str = "key"):
    """ds(key, lng, lat) → Dataset(a_key, b_key, chord2): all pairs
    within CHORD_T. One map (quantize + 5× grid duplicate), one key
    shuffle, per-cell vectorized integer pair kernel."""
    return (
        ds.map_batches(grid_duplicate_batch, batch_format="pyarrow",
                       fn_kwargs={"key_col": key_col})
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pyarrow")
    )
