"""Job state: checkpoint manifests, per-partition counters/lineage."""
