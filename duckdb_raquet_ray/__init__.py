"""raydata-columnar-encode: a Ray-Data-native per-column lightweight
compression engine (see README.md / SURVEY.md).

Public API — a user of the reference switches to these entry points:

    import duckdb_raquet_ray as drr
    drr.encode_job(paths, out_dir)            # lineage-partitioned encode
    drr.encode_job_grouped(paths, out_dir)    # salted groupby-on-source encode
    ds = drr.read_encoded(out_dir)            # decoded rows as a Dataset
    drr.verify_encoded(out_dir)               # bit-identity gate
    drr.export_job(out_dir, dest)             # back to plain Parquet

CLI: ``python -m duckdb_raquet_ray.cli --help``.
"""

__version__ = "0.1.0"

from .pipelines.decode import (  # noqa: F401
    export_job,
    point_lookup,
    read_encoded,
    read_encoded_for_shard,
    read_encoded_range,
    verify_encoded,
    verify_job,
    verify_multiset,
)
from .pipelines.encode import (  # noqa: F401
    auto_target_part_bytes,
    encode_job,
    plan_partitions,
)
from .pipelines.encode_grouped import compute_salt_map, encode_job_grouped  # noqa: F401
