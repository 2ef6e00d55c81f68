"""Small shared helpers."""

from __future__ import annotations


def default_concurrency(cap: int | None = None) -> int:
    """Actor-pool size default: the cluster's CPU count (map_batches with a
    callable class requires explicit concurrency in Ray 2.49)."""
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        n = 0
    if n <= 0:
        import os

        n = os.cpu_count() or 4
    if cap is None:
        return n
    return max(1, min(n, cap))
