"""Two-SIMULATED-node scaling evidence (VERDICT r4 item 8).

The sandbox cannot add machines, but it CAN run two raylets: `ray start
--head --num-cpus=4` plus a second `ray start --address=... --num-cpus=4`
gives a 2-node logical cluster on one host — two schedulers, two plasma
object stores, and a real object-transport boundary between them (task
args/results crossing raylets go through the object store transfer path a
multi-node deployment uses; only DRAM bandwidth is still shared).

The script measures the headline encode job:

  A. on the 2-node cluster (4+4 cpus) with mid-run per-node CPU sampling
     (both raylets must be busy — proves the actor pool actually spread)
     and per-node object-store usage sampling (the encode's cross-node
     object traffic should stay ~0: partitions publish to disk, only
     O(bytes) manifest entries return);
  B. on a single-node 8-cpu baseline in a fresh process (same TOTAL
     parallelism, same input) via `bench.py --encode-only`.

Throughput(A)/Throughput(B) ~ 1.0 is the multi-node argument made as a
measurement: splitting the same parallelism across two schedulers +
object stores costs nothing, because the encode exchanges no
cross-partition data. Artifact: SCALING_r05_2node.json at the repo root.

Usage (owns its Ray sessions — run standalone, never from the driver):
    python tools/two_node_scaling.py [--rows 2000000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

ADDR = "127.0.0.1:6379"


def _ray(*args: str) -> None:
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("RAY_ADDRESS", None)  # the preset 'local' would shadow the cluster
    subprocess.run(["ray", *args], check=True, capture_output=True, env=env)


def _sample_nodes(stop: threading.Event, out: list) -> None:
    """Poll per-node available CPU + object store until stopped."""
    import ray._private.state as st

    while not stop.is_set():
        try:
            out.append({"t": time.time(), "nodes": st.available_resources_per_node()})
        except Exception:
            pass
        stop.wait(0.5)


def two_node_run(rows: int, runs: int) -> dict:
    import ray

    os.environ.pop("RAY_ADDRESS", None)
    os.environ["PYTHONPATH"] = REPO
    subprocess.run(["ray", "stop", "--force"], capture_output=True)
    _ray("start", "--head", "--num-cpus=4", "--port=6379",
         "--include-dashboard=false", "--disable-usage-stats")
    _ray("start", f"--address={ADDR}", "--num-cpus=4", "--disable-usage-stats")
    try:
        ray.init(address=ADDR, ignore_reinit_error=True)
        import bench
        from duckdb_raquet_ray.pipelines import encode as _enc

        _enc.ENCODER_NUM_CPUS = 1  # full-density: identical config to the
        # single-node 8-cpu baseline (bench.py --encode-only contract)
        paths = bench.ensure_corpus(rows)
        out_dir = "/tmp/raquet_2node_out"
        best = None
        for _ in range(runs):
            shutil.rmtree(out_dir, ignore_errors=True)
            # per-RUN sample list: the busy-node evidence must come from
            # the SAME run whose timing is reported, not a sibling run
            samples: list = []
            stop = threading.Event()
            th = threading.Thread(target=_sample_nodes, args=(stop, samples))
            th.start()
            t0 = time.time()
            meta = _enc.encode_job(paths, out_dir, concurrency=8)
            dt = time.time() - t0
            stop.set()
            th.join()
            if best is None or dt < best[0]:
                best = (dt, meta, samples)
        dt, meta, samples = best
        # per-node evidence: min available CPU seen on each node mid-run
        per_node_min_cpu: dict[str, float] = {}
        per_node_min_objstore: dict[str, float] = {}
        for s in samples:
            for nid, res in s["nodes"].items():
                c = float(res.get("CPU", 0.0))
                o = float(res.get("object_store_memory", 0.0))
                per_node_min_cpu[nid] = min(per_node_min_cpu.get(nid, 99.0), c)
                per_node_min_objstore[nid] = min(
                    per_node_min_objstore.get(nid, float("inf")), o
                )
        totals = {
            nid: float(res.get("object_store_memory", 0.0))
            for nid, res in __import__(
                "ray._private.state", fromlist=["total_resources_per_node"]
            ).total_resources_per_node().items()
        }
        gb = meta["input_bytes"] / 1e9
        return {
            "sec": dt,
            "gbps": gb / dt,
            "rows": meta["num_rows"],
            "nodes": len(per_node_min_cpu),
            "per_node_min_available_cpu": per_node_min_cpu,
            "per_node_peak_objstore_used_bytes": {
                # clamp: a node present mid-run but absent from the final
                # totals snapshot (raylet exit) must not read negative
                nid: max(0, int(totals.get(nid, 0.0) - v))
                for nid, v in per_node_min_objstore.items()
            },
            "n_samples": len(samples),
        }
    finally:
        try:
            ray.shutdown()
        except Exception:
            pass
        subprocess.run(["ray", "stop", "--force"], capture_output=True)


def single_node_run(rows: int, runs: int) -> dict:
    out = "/tmp/raquet_2node_baseline.json"
    env = {**os.environ, "PYTHONPATH": REPO, "RAY_ADDRESS": "local",
           "GRAFT_BENCH_ROWS": str(rows)}
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--encode-only",
         "--cpus", "8", "--runs", str(runs), "--json-out", out],
        check=True, cwd=REPO, capture_output=True, env=env,
    )
    return json.load(open(out))["encode"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r05_2node.json"))
    args = ap.parse_args()

    import bench

    probe = {"p2": bench.stream_probe(2), "p8": bench.stream_probe(8)}
    two = two_node_run(args.rows, args.runs)
    one = single_node_run(args.rows, args.runs)
    probe_post = {"p2": bench.stream_probe(2), "p8": bench.stream_probe(8)}
    rec = {
        "metric": "encode_two_raylet_vs_single_raylet_8cpu",
        "two_node_4p4": two,
        "single_node_8": {"sec": one["sec"], "gbps": one["gbps"]},
        "throughput_ratio_two_over_one": round(two["gbps"] / one["gbps"], 4),
        "probe_gbps": probe,
        "probe_gbps_post": probe_post,
        "rows": args.rows,
        "note": (
            "two raylets + two plasma stores on one host: the scheduling/"
            "object-transport boundary of a real 2-node cluster, minus "
            "only the shared DRAM. ratio ~1.0 = splitting the same "
            "parallelism across nodes costs nothing (no cross-partition "
            "exchange in the encode); per_node_min_available_cpu ~0 on "
            "BOTH nodes = the actor pool genuinely spread."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
