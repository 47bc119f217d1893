"""Per-batch Ray Data transforms (stateless tasks + actor-pool classes)."""
