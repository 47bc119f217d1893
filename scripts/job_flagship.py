#!/usr/bin/env python
"""Cluster job entrypoint for the flagship pipeline.

On a real cluster (BASELINE.json north_rule):

    ray job submit --address http://head:8265 \
        --working-dir . -- python scripts/job_flagship.py \
        --pages s3://bucket/pages/ --polygons s3://bucket/polygons.parquet \
        --out s3://bucket/out/run1 --resume

The job is resumable: output is partition-addressed per input shard
with a manifest (state/checkpoint.py), so resubmitting after a driver
failure processes only the missing shards. Locally it runs the same
code against the synthetic tables.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None, help="pages parquet dir")
    ap.add_argument("--polygons", default=None, help="polygon layer parquet")
    ap.add_argument("--out", default="/tmp/ogr_job_out")
    ap.add_argument("--sf", type=float, default=0.001,
                    help="synthesize inputs at this scale if paths not given")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local only; on a cluster the address decides")
    args = ap.parse_args()

    import os

    # workers must import the package: on a cluster `ray job submit
    # --working-dir` ships it; locally PYTHONPATH is inherited
    os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime connects automatically; this
        # branch only fires for local runs
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocaml_geojson_ray.pipelines.resumable import flagship_resumable
    from ocaml_geojson_ray.sources.pages import materialize_pages_parquet
    from ocaml_geojson_ray.sources.polygons import generate_polygon_layer

    pages = args.pages or materialize_pages_parquet(args.sf, root="/tmp/ogr_data")
    polys = args.polygons or generate_polygon_layer(args.sf, root="/tmp/ogr_data")

    t0 = time.time()
    done = flagship_resumable(pages, polys, args.out)
    print(json.dumps({
        "processed_shards": len(done),
        "metrics": done,
        "elapsed_s": round(time.time() - t0, 2),
        "out": args.out,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
