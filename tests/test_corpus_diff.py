"""Snapshot diff: classification parity vs a pandas reference, bucket
invariance, and the duplicate-key loudness guard."""

import numpy as np
import pyarrow as pa
import pytest

from duckdb_raquet_ray.pipelines import dedup


def _snapshots():
    old = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["a", "b", None, "d", "e"],
    })
    new = pa.table({
        "doc_id": pa.array([2, 3, 4, 6], pa.int64()),
        # 2 unchanged, 3 unchanged (None == '' by fillna rule), 4 changed
        "text": ["b", "", "D!", "f"],
    })
    want = {1: "removed", 2: "unchanged", 3: "unchanged",
            4: "changed", 5: "removed", 6: "added"}
    return old, new, want


class TestCorpusDiff:
    def test_classification_and_bucket_invariance(self, ray_session):
        import ray.data as rd

        old, new, want = _snapshots()
        for nb, parts in ((1, 1), (7, 3)):
            got = dedup.corpus_diff(
                rd.from_arrow(old).repartition(parts),
                rd.from_arrow(new).repartition(parts),
                n_buckets=nb,
            ).to_pandas()
            assert dict(zip(got["doc_id"], got["status"])) == want

    def test_duplicate_key_raises(self, ray_session):
        import ray.data as rd

        old = pa.table({"doc_id": pa.array([1, 1], pa.int64()),
                        "text": ["x", "y"]})
        new = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["x"]})
        with pytest.raises(Exception, match="duplicate"):
            dedup.corpus_diff(
                rd.from_arrow(old), rd.from_arrow(new), n_buckets=1
            ).to_pandas()
