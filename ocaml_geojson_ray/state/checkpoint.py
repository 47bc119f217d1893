"""Checkpoint / resume via partition manifests (SURVEY.md §2.2 N10).

Resumable output layout: one directory per input shard
(``out/part=<shard>/``), written atomically (tmp dir + rename) with a
manifest JSON recording completed shards. A rerun loads the manifest
and processes ONLY the missing shards — "resumes from checkpoint
without recomputation" in batch terms. Ray's own task retry covers
transient failures inside a run; the manifest covers driver restarts.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Iterable


class PartitionManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self._done: dict = {}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                self._done = json.load(fh)

    def is_done(self, shard: str) -> bool:
        return shard in self._done

    def mark_done(self, shard: str, meta: dict | None = None) -> None:
        self._done[shard] = meta or {}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._done, fh, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def pending(self, shards: Iterable[str]) -> list:
        return [s for s in shards if not self.is_done(s)]

    def shard_dir(self, shard: str) -> str:
        return os.path.join(self.out_dir, f"part={shard}")


def run_resumable(
    shards: Iterable[str],
    out_dir: str,
    run_shard: Callable[[str, str], dict],
) -> dict:
    """Process shards not yet in the manifest.

    ``run_shard(shard, dest_dir) -> metrics`` writes its output into
    ``dest_dir`` (a temp dir; atomically renamed into place on
    success). Returns {shard: metrics} for the shards processed now.
    """
    man = PartitionManifest(out_dir)
    done_now = {}
    for shard in man.pending(shards):
        final = man.shard_dir(shard)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        metrics = run_shard(shard, tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        man.mark_done(shard, metrics)
        done_now[shard] = metrics
    return done_now
