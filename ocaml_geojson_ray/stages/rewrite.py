"""Ray-level streaming-equivalent transforms (SURVEY.md §2.1 T1-T6).

The reference's geojsone map/fold/iter operate on one document stream;
here each operates on a Dataset with a document-text column, one row
per document, composing the text-level kernels in
functions/streaming.py per batch:

- ``MapProps`` / ``MapGeometry``   (T2/T1) — rewrite stages; errors as
  data (``rewrite_error`` column), pass-through rows untouched.
- ``fold_props`` / ``fold_geometry`` (T4/T3) — per-batch partial fold
  (the user supplies fold + merge, both driver-side deterministic),
  combined across blocks; document order holds WITHIN a document,
  cross-document combine must be commutative (documented — Ray blocks
  are unordered, SURVEY.md §4).
- ``iter_props`` / ``iter_geometry`` (T6/T5) — driver-side streaming
  iteration via ``iter_batches`` (bounded memory, ordered per doc).
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa

from ..core.model import Geometry
from ..functions import streaming as S


class MapProps:
    """T2 as an actor-pool stage: doc_col text → rewritten text."""

    def __init__(self, fn: Callable[[Any], Any], doc_col: str = "cand_text",
                 out_col: str | None = None):
        self.fn = fn
        self.doc_col = doc_col
        self.out_col = out_col or doc_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch[self.doc_col].to_pylist()
        outs, errs = [], []
        for d in docs:
            try:
                outs.append(S.map_props_text(d, self.fn))
                errs.append(None)
            except (S.StreamError, ValueError) as e:
                outs.append(d)
                errs.append(str(e))
        i = batch.schema.get_field_index(self.out_col)
        arr = pa.array(outs, pa.string())
        batch = (batch.set_column(i, self.out_col, arr) if i >= 0
                 else batch.append_column(self.out_col, arr))
        return batch.append_column("rewrite_error", pa.array(errs, pa.string()))


class MapGeometry:
    """T1 as an actor-pool stage (Geometry → Geometry UDF)."""

    def __init__(self, fn: Callable[[Geometry], Geometry],
                 doc_col: str = "cand_text", out_col: str | None = None):
        self.fn = fn
        self.doc_col = doc_col
        self.out_col = out_col or doc_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch[self.doc_col].to_pylist()
        outs, errs = [], []
        for d in docs:
            try:
                outs.append(S.map_geometry_text(d, self.fn))
                errs.append(None)
            except (S.StreamError, ValueError) as e:
                outs.append(d)
                errs.append(str(e))
        i = batch.schema.get_field_index(self.out_col)
        arr = pa.array(outs, pa.string())
        batch = (batch.set_column(i, self.out_col, arr) if i >= 0
                 else batch.append_column(self.out_col, arr))
        return batch.append_column("rewrite_error", pa.array(errs, pa.string()))


def fold_props(ds, fn, init, merge, doc_col: str = "cand_text"):
    """T4 over a Dataset: per-batch partial folds, merged on the driver.

    ``fn(acc, props) -> acc`` runs in document order within each doc;
    ``merge(acc_a, acc_b) -> acc`` combines partials and MUST be
    commutative+associative (cross-block order is unspecified).
    """
    def partial(batch: pa.Table) -> pa.Table:
        import pickle

        acc = init
        for d in batch[doc_col].to_pylist():
            acc = S.fold_props_text(d, fn, acc)
        return pa.table({"partial": pa.array([pickle.dumps(acc)], pa.binary())})

    import pickle

    acc = init
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["partial"].to_pylist():
            acc = merge(acc, pickle.loads(blob))
    return acc


def fold_geometry(ds, fn, init, merge, doc_col: str = "cand_text"):
    """T3 over a Dataset (same contract as fold_props)."""
    def partial(batch: pa.Table) -> pa.Table:
        import pickle

        acc = init
        for d in batch[doc_col].to_pylist():
            acc = S.fold_geometry_text(d, fn, acc)
        return pa.table({"partial": pa.array([pickle.dumps(acc)], pa.binary())})

    import pickle

    acc = init
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["partial"].to_pylist():
            acc = merge(acc, pickle.loads(blob))
    return acc


def iter_props(ds, fn, doc_col: str = "cand_text") -> None:
    """T6: driver-side visit of every properties value (streamed)."""
    for b in ds.iter_batches(batch_format="pyarrow"):
        for d in b[doc_col].to_pylist():
            S.iter_props_text(d, fn)


def iter_geometry(ds, fn, doc_col: str = "cand_text") -> None:
    """T5: driver-side visit of every geometry (as GeoJson, matching
    the reference quirk of passing the whole G.t)."""
    for b in ds.iter_batches(batch_format="pyarrow"):
        for d in b[doc_col].to_pylist():
            S.iter_geometry_text(d, fn)
