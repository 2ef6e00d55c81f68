"""Join-family + window operators vs DuckDB ground truth (pipelines/joins).

The merge kernel is also fuzzed directly against a brute-force reference —
the Ray-level tests pin the distributed plumbing (broadcast vs bucketed
shuffle both produce the identical relation)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_raquet_ray.pipelines import joins

SF = "/root/testdata/sf0.001"
WEEK_US = 7 * 86_400_000_000


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders", "customer"):
        c.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    return c


def test_asof_merge_kernel_vs_bruteforce():
    rng = np.random.default_rng(7)
    for _ in range(120):
        nl, nr = int(rng.integers(1, 50)), int(rng.integers(0, 50))
        l_key = rng.integers(0, 6, nl)
        l_ts = rng.integers(0, 40, nl)
        r_key = rng.integers(0, 6, nr)
        r_ts = rng.integers(0, 40, nr)
        r_tie = rng.permutation(nr).astype(np.int64)
        got = joins._asof_merge_indices(l_key, l_ts, r_key, r_ts, r_tie)
        for i in range(nl):
            cand = [j for j in range(nr) if r_key[j] == l_key[i] and r_ts[j] <= l_ts[i]]
            if not cand:
                exp = -1
            else:
                mts = max(r_ts[j] for j in cand)
                exp = max((j for j in cand if r_ts[j] == mts), key=lambda j: r_tie[j])
            assert got[i] == exp


def test_broadcast_join_matches_sql(ray_session, con):
    import ray.data as rd

    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"])
    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = (
        joins.broadcast_join(ds, cust, "o_custkey", "c_custkey")
        .to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    )
    exp = con.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"
    ).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_broadcast_join_left_and_unmatched(ray_session, con):
    import pyarrow as pa
    import ray.data as rd

    # dimension covering only even keys -> odd keys unmatched
    dim = pa.table({"k": pa.array([0, 2, 4], type=pa.int64()),
                    "name": ["a", "b", "c"]})
    ds = rd.from_items([{"k": i} for i in range(6)])
    inner = joins.broadcast_join(ds, dim, "k", "k").to_pandas()
    assert sorted(inner["k"]) == [0, 2, 4]
    left = joins.broadcast_join(ds, dim, "k", "k", how="left").to_pandas()
    assert len(left) == 6 and left["name"].isna().sum() == 3


ASOF_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       o_orderkey, epoch_us(o_orderdate) AS o_date_us, o_totalprice FROM (
  SELECT e.*, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) WHERE rn = 1
ORDER BY event_id
"""


def _asof_expected(con):
    return con.sql(ASOF_SQL).df()


def _norm_asof(df):
    df = df.copy()
    df["ts_us"] = df["ts"].astype("int64")
    df["o_date_us"] = df["o_orderdate"].astype("int64")
    return (
        df[["event_id", "user_id", "ts_us", "o_orderkey", "o_date_us", "o_totalprice"]]
        .sort_values("event_id").reset_index(drop=True)
    )


def test_asof_join_broadcast_matches_sql(ray_session, con):
    import ray.data as rd

    orders = pq.read_table(f"{SF}/orders.parquet")
    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    out = joins.asof_join_broadcast(
        ev, orders, left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate", tie_col="o_orderkey",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm_asof(out), _asof_expected(con))


def test_asof_join_bucketed_matches_broadcast(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    ods = rd.read_parquet(f"{SF}/orders.parquet")
    out = joins.asof_join(
        ev, ods, left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate", tie_col="o_orderkey",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"], n_buckets=16,
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm_asof(out), _asof_expected(con))


def test_window_agg_tumbling(ray_session, con):
    import ray.data as rd

    out = joins.window_agg(
        rd.read_parquet(f"{SF}/events.parquet"), "ts", WEEK_US, "value",
        group_col="event_type",
    ).to_pandas().rename(columns={"count()": "cnt", "min(value)": "min_v", "max(value)": "max_v"})
    out = out.sort_values(["w_us", "event_type"]).reset_index(drop=True)
    exp = con.sql(
        f"SELECT (epoch_us(ts) // {WEEK_US}) * {WEEK_US} AS w_us, event_type, "
        "COUNT(*)::BIGINT AS cnt, MIN(value) AS min_v, MAX(value) AS max_v "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_window_agg_sliding(ray_session, con):
    import ray.data as rd

    out = joins.window_agg(
        rd.read_parquet(f"{SF}/events.parquet"), "ts", WEEK_US, "value",
        size_us=3 * WEEK_US,
    ).to_pandas().rename(columns={"count()": "cnt", "min(value)": "min_v", "max(value)": "max_v"})
    out = out.sort_values("w_us").reset_index(drop=True)
    exp = con.sql(
        "SELECT w_us, COUNT(*)::BIGINT AS cnt, MIN(value) AS min_v, MAX(value) AS max_v "
        f"FROM (SELECT unnest(generate_series(epoch_us(ts) // {WEEK_US} - 2, "
        f"epoch_us(ts) // {WEEK_US})) * {WEEK_US} AS w_us, value FROM events) "
        "GROUP BY 1 ORDER BY 1"
    ).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_session_windows(ray_session, con):
    import ray.data as rd

    gap = 3 * 86_400_000_000
    out = joins.session_windows(
        rd.read_parquet(f"{SF}/events.parquet"), "user_id", "ts", gap, "event_id",
        n_buckets=8,
    ).to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    exp = con.sql(f"""
        WITH x AS (SELECT user_id, epoch_us(ts) t, event_id,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap}
               THEN 1 ELSE 0 END brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT user_id, t, SUM(brk) OVER (PARTITION BY user_id
              ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) sid FROM x)
        SELECT user_id, sid::BIGINT AS session_id, COUNT(*)::BIGINT AS n_events,
               MIN(t)::BIGINT AS start_us, MAX(t)::BIGINT AS end_us
        FROM s GROUP BY 1, 2 ORDER BY 1, 2""").df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_session_windows_gap_edges(ray_session):
    """Gap exactly equal to the threshold does NOT break a session; one
    more microsecond does. Equal timestamps order by the tie column."""
    import ray.data as rd

    rows = [
        {"k": 1, "ts": 0, "tie": 2},
        {"k": 1, "ts": 0, "tie": 1},   # equal ts: tie orders them
        {"k": 1, "ts": 10, "tie": 3},  # gap == 10 -> same session
        {"k": 1, "ts": 21, "tie": 4},  # gap 11 > 10 -> new session
        {"k": 2, "ts": 5, "tie": 5},
    ]
    ds = rd.from_items(rows)
    out = joins.session_windows(ds, "k", "ts", 10, "tie", n_buckets=4).to_pandas()
    out = out.sort_values(["k", "session_id"]).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"k": 1, "session_id": 1, "n_events": 3, "start_us": 0, "end_us": 10},
        {"k": 1, "session_id": 2, "n_events": 1, "start_us": 21, "end_us": 21},
        {"k": 2, "session_id": 1, "n_events": 1, "start_us": 5, "end_us": 5},
    ]


# ---------------------------------------------------------------------------
# hash_join (large-large bucketed equi-join)
# ---------------------------------------------------------------------------


def test_equi_expand_vs_bruteforce():
    rng = np.random.default_rng(4)
    for _ in range(50):
        lk = rng.integers(0, 12, size=rng.integers(0, 40))
        rk = rng.integers(0, 12, size=rng.integers(0, 40))
        l_idx, r_idx, cnt = joins._equi_expand(lk, rk)
        want = [(i, j) for i in range(len(lk)) for j in range(len(rk)) if lk[i] == rk[j]]
        got = sorted(zip(l_idx.tolist(), r_idx.tolist()))
        assert got == sorted(want)
        assert cnt.sum() == len(want)


def test_hash_join_inner_matches_sql(ray_session, con):
    import ray.data as rd

    out = joins.hash_join(
        rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]),
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]),
        left_key="l_orderkey",
        right_key="o_orderkey",
        right_cols=["o_custkey"],
    ).to_pandas().sort_values(["l_orderkey", "l_quantity", "o_custkey"]).reset_index(drop=True)
    want = con.sql(
        "SELECT l_orderkey, l_quantity, o_custkey FROM 'DIR/lineitem.parquet' l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "ORDER BY l_orderkey, l_quantity, o_custkey".replace("DIR", SF)
    ).df()
    assert len(out) == len(want)
    assert (out["o_custkey"].to_numpy() == want["o_custkey"].to_numpy()).all()


def test_hash_join_left_string_keys_nulls_dups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    left = pa.table(
        {
            "k": pa.array(["a", "b", "b", None, "z"]),
            "lv": pa.array([1, 2, 3, 4, 5]),
        }
    )
    right = pa.table(
        {
            "k": pa.array(["a", "a", "b", None, "c"]),
            "rv": pa.array([10, 11, 20, 99, 30]),
        }
    )
    out = (
        joins.hash_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_key="k", right_key="k", right_cols=["rv"], how="left",
        )
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    # SQL semantics: NULL keys never match (pandas merge would join
    # NaN==NaN) — drop the right side's null-key row from the expectation
    want = (
        left.to_pandas()
        .merge(right.to_pandas().dropna(subset=["k"]), on="k", how="left")
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want)  # a:1 match, b:1 each x2, None:unmatched, z:unmatched
    assert out["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()


def test_hash_join_inner_drops_null_keys(ray_session):
    import pyarrow as pa
    import ray.data as rd

    left = pa.table({"k": pa.array([1, None], type=pa.int64()), "lv": pa.array([1, 2])})
    right = pa.table({"k": pa.array([1, None], type=pa.int64()), "rv": pa.array([7, 8])})
    out = joins.hash_join(
        rd.from_arrow(left), rd.from_arrow(right), left_key="k", right_key="k"
    ).to_pandas()
    assert len(out) == 1 and out["rv"].iloc[0] == 7


def test_hash_join_fuzz_vs_pandas(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(8)
    for trial in range(3):
        left = pd.DataFrame(
            {"k": rng.integers(0, 30, size=200), "lv": rng.integers(0, 100, size=200)}
        )
        right = pd.DataFrame(
            {"k": rng.integers(0, 30, size=150), "rv": rng.integers(0, 100, size=150)}
        )
        for how in ("inner", "left"):
            out = (
                joins.hash_join(
                    rd.from_arrow(pa.Table.from_pandas(left)),
                    rd.from_arrow(pa.Table.from_pandas(right)),
                    left_key="k", right_key="k", right_cols=["rv"], how=how,
                    n_buckets=7,
                )
                .to_pandas()
                .sort_values(["k", "lv", "rv"])
                .reset_index(drop=True)
            )
            want = (
                left.merge(right, on="k", how=how)
                .sort_values(["k", "lv", "rv"])
                .reset_index(drop=True)
            )
            assert len(out) == len(want), (trial, how)
            assert out["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()


def test_bucket_ids_nullable_and_wide_int_keys():
    import warnings
    import pyarrow as pa

    # nullable int column: must NOT round-trip through float64 (NaN cast
    # is undefined) — nulls bucket deterministically, non-nulls keep the
    # plain modulus
    col = pa.chunked_array([pa.array([7, None, 300], pa.int64())])
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        b = joins._bucket_ids(col, 16)
    assert b.dtype == np.int32
    assert b[0] == 7 % 16 and b[2] == 300 % 16
    assert 0 <= b[1] < 16

    # int keys above 2^53: float64 would collapse adjacent keys before the
    # modulus — exact ints must stay distinguishable
    big = (1 << 60) + 1
    wide = pa.chunked_array([pa.array([big, big + 1], pa.int64())])
    bw = joins._bucket_ids(wide, 16)
    assert bw[0] != bw[1]

    # uint64 above 2^63 wraps to two's complement, deterministically
    u = pa.chunked_array([pa.array([(1 << 63) + 5], pa.uint64())])
    bu = joins._bucket_ids(u, 16)
    assert 0 <= bu[0] < 16


def test_hash_join_semi_anti(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    # halve the right side so BOTH outcomes are non-empty
    import pyarrow as pa
    import pyarrow.compute as pc

    cust = rd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t.column("c_custkey"), pa.scalar(1)), 0)
        ),
        batch_format="pyarrow",
    )
    semi = joins.hash_join(
        ev, cust, left_key="user_id", right_key="c_custkey", how="semi"
    ).to_pandas()
    anti = joins.hash_join(
        ev, cust, left_key="user_id", right_key="c_custkey", how="anti"
    ).to_pandas()
    want_semi = con.sql(
        "SELECT event_id, user_id FROM events WHERE user_id IN "
        "(SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0) ORDER BY event_id"
    ).df()
    want_anti = con.sql(
        "SELECT event_id, user_id FROM events e WHERE NOT EXISTS "
        "(SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id AND c.c_custkey % 2 = 0) "
        "ORDER BY event_id"
    ).df()
    assert len(want_semi) and len(want_anti)
    assert sorted(semi.columns) == ["event_id", "user_id"]  # left cols only
    assert semi.sort_values("event_id").event_id.tolist() == want_semi.event_id.tolist()
    assert anti.sort_values("event_id").event_id.tolist() == want_anti.event_id.tolist()


def test_hash_join_anti_keeps_null_keys(ray_session):
    import pyarrow as pa
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": pa.array([1, None, 3], pa.int64()),
                                   "v": ["a", "b", "c"]}))
    right = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    anti = joins.hash_join(left, right, left_key="k", right_key="k", how="anti")
    got = sorted(r["v"] for r in anti.take_all())
    assert got == ["b", "c"]  # null key never matches -> kept by anti
    semi = joins.hash_join(left, right, left_key="k", right_key="k", how="semi")
    assert [r["v"] for r in semi.take_all()] == ["a"]


def test_hash_join_full_outer(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    left = pa.table(
        {
            "k": pa.array([1, 1, 2, None, 7], pa.int64()),
            "lv": ["a", "b", "c", "d", "e"],
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 3, 3, None], pa.int64()),
            "rv": pa.array([10, 30, 31, 99], pa.int64()),
        }
    )
    got = (
        joins.hash_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_key="k", right_key="k", right_cols=["rv"], how="full",
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = (
        con.sql(
            "SELECT l.k, l.lv, r.rv FROM l FULL JOIN r ON l.k = r.k "
            "ORDER BY l.k NULLS LAST, l.lv NULLS LAST, r.rv NULLS LAST"
        )
        .df()
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 8  # 2 matched + 3 left-only + 3 right-only
    for c in ("k", "lv", "rv"):
        assert got[c].fillna(-1).tolist() == want[c].fillna(-1).tolist()


def test_hash_join_full_right_only_bucket(ray_session):
    # every right key misses the left entirely (exercises the
    # right-rows-only bucket early path)
    import pyarrow as pa
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "lv": ["a"]}))
    right = rd.from_arrow(
        pa.table({"k": pa.array([100, 200], pa.int64()),
                  "rv": pa.array([5, 6], pa.int64())})
    )
    out = joins.hash_join(
        left, right, left_key="k", right_key="k", right_cols=["rv"], how="full"
    ).to_pandas()
    assert len(out) == 3
    assert sorted(out["rv"].dropna().astype(int).tolist()) == [5, 6]


class TestRangeJoin:
    def _intervals(self):
        import pyarrow as pa

        return pa.table(
            {
                "interval_id": pa.array([0, 1, 2, 3], pa.int64()),
                "lo": pa.array([0, 5, 5, 100], pa.int64()),
                "hi": pa.array([10, 7, 20, 100], pa.int64()),
            }
        )

    def test_kernel_vs_bruteforce_random(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        rng = np.random.default_rng(3)
        for _ in range(20):
            n, m = int(rng.integers(1, 80)), int(rng.integers(1, 15))
            v = rng.integers(0, 50, n)
            lo = rng.integers(0, 50, m)
            hi = lo + rng.integers(0, 20, m)
            left = pa.table({"rid": pa.array(np.arange(n)), "v": pa.array(v)})
            iv = pa.table(
                {
                    "interval_id": pa.array(np.arange(m)),
                    "lo": pa.array(lo),
                    "hi": pa.array(hi),
                }
            )
            got = sorted(
                (r["rid"], r["interval_id"])
                for r in joins.range_join_broadcast(
                    rd.from_arrow(left), iv, left_val="v", lo_col="lo",
                    hi_col="hi", payload_cols=["interval_id"], concurrency=1,
                ).take_all()
            )
            want = sorted(
                (i, j)
                for i in range(n)
                for j in range(m)
                if lo[j] <= v[i] <= hi[j]
            )
            assert got == want

    def test_inclusive_ends_and_overlap(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        left = pa.table({"rid": pa.array([1, 2, 3, 4], pa.int64()),
                         "v": pa.array([0, 10, 6, 100], pa.int64())})
        got = sorted(
            (r["rid"], r["interval_id"])
            for r in joins.range_join_broadcast(
                rd.from_arrow(left), self._intervals(), left_val="v",
                lo_col="lo", hi_col="hi", payload_cols=["interval_id"],
                concurrency=1,
            ).take_all()
        )
        # v=0 and v=10 hit interval 0 at both INCLUSIVE ends (10 also lands
        # in [5,20]); v=6 overlaps intervals 0,1,2; v=100 hits the
        # degenerate point interval
        assert got == [(1, 0), (2, 0), (2, 2), (3, 0), (3, 1), (3, 2), (4, 3)]

    def test_left_join_nulls(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        left = pa.table({"rid": pa.array([1, 2], pa.int64()),
                         "v": pa.array([6, 999], pa.int64())})
        rows = joins.range_join_broadcast(
            rd.from_arrow(left), self._intervals(), left_val="v",
            lo_col="lo", hi_col="hi", payload_cols=["interval_id"],
            how="left", concurrency=1,
        ).take_all()
        unmatched = [r for r in rows if r["rid"] == 2]
        assert len(unmatched) == 1 and unmatched[0]["interval_id"] is None
        assert sum(1 for r in rows if r["rid"] == 1) == 3

    def test_matches_duckdb(self, ray_session, con):
        import pyarrow as pa
        import ray.data as rd

        ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
        base = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z epoch us
        step, width, n = 12 * 3_600_000_000, 18 * 3_600_000_000, 60
        iv = pa.table(
            {
                "interval_id": pa.array(np.arange(n, dtype=np.int64)),
                "lo_us": pa.array(base + np.arange(n, dtype=np.int64) * step),
                "hi_us": pa.array(base + np.arange(n, dtype=np.int64) * step + width),
            }
        )
        got = sorted(
            (r["event_id"], r["interval_id"])
            for r in joins.range_join_broadcast(
                ev, iv, left_val="ts", lo_col="lo_us", hi_col="hi_us",
                payload_cols=["interval_id"],
            ).take_all()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                WITH iv AS (
                  SELECT k AS interval_id,
                         ({base} + k * {step})::BIGINT AS lo_us,
                         ({base} + k * {step} + {width})::BIGINT AS hi_us
                  FROM (SELECT unnest(generate_series(0, {n - 1})) AS k)
                )
                SELECT e.event_id, iv.interval_id
                FROM events e JOIN iv
                  ON epoch_us(e.ts) BETWEEN iv.lo_us AND iv.hi_us
                """
            ).fetchall()
        )
        assert got == want


class TestCumulativeWindow:
    def _events(self, n=400, keys=7, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        return pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                rng.integers(0, 40, n) * 1_000_000, pa.timestamp("us")
            ),
            "user_id": pa.array(rng.integers(0, keys, n), pa.int64()),
            "value": pa.array(
                [None if i % 9 == 0 else round(float(rng.normal()), 6)
                 for i in range(n)],
                pa.float64(),
            ),
        })

    def test_matches_sql_and_bucket_invariant(self, ray_session):
        import duckdb
        import pandas.testing as pdt
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        t = self._events()
        got = (
            J.cumulative_window(
                rd.from_arrow(t).repartition(6), "user_id", "ts", "event_id",
                "value", n_buckets=3,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        got2 = (
            J.cumulative_window(
                rd.from_arrow(t).repartition(1), "user_id", "ts", "event_id",
                "value", n_buckets=64,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pdt.assert_frame_equal(got, got2)  # fan-out/block invariant
        con = duckdb.connect()
        con.register("events", t)
        want = (
            con.execute(J.cumulative_window_oracle_sql())
            .df()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert got["cum_n"].tolist() == want["cum_n"].tolist()
        # integer micro-units: EXACT equality, no float tolerance at all
        assert got["cum_value_micro"].tolist() == want["cum_value_micro"].tolist()
        assert got["user_id"].tolist() == want["user_id"].tolist()


class TestLagGapWindow:
    def test_matches_sql(self, ray_session):
        import pandas.testing as pdt
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        t = TestCumulativeWindow()._events(n=300, keys=5, seed=8)
        t = t.select(["event_id", "ts", "user_id"])
        got = (
            J.lag_gap_window(
                rd.from_arrow(t).repartition(4), "user_id", "ts", "event_id",
                n_buckets=3,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", t)
        want = (
            con.execute(J.lag_gap_oracle_sql())
            .df()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pdt.assert_frame_equal(got, want, check_dtype=False)
        # exactly one NULL gap per key (the first event)
        assert int(got["gap_us"].isna().sum()) == got["user_id"].nunique()


class TestRollingWindow:
    def _events(self, n=400, keys=7, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        return pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                rng.integers(0, 40, n) * 1_000_000, pa.timestamp("us")
            ),
            "user_id": pa.array(rng.integers(0, keys, n), pa.int64()),
            "value": pa.array(
                [None if i % 9 == 0 else round(float(rng.normal()), 6)
                 for i in range(n)],
                pa.float64(),
            ),
        })

    def test_matches_sql_and_bucket_invariant(self, ray_session):
        import duckdb
        import pandas.testing as pdt
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        t = self._events()
        got = (
            J.rolling_window(
                rd.from_arrow(t).repartition(6), "user_id", "ts", "event_id",
                "value", window_rows=5, n_buckets=3,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        got2 = (
            J.rolling_window(
                rd.from_arrow(t).repartition(1), "user_id", "ts", "event_id",
                "value", window_rows=5, n_buckets=64,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        pdt.assert_frame_equal(got, got2)
        con = duckdb.connect()
        con.register("events", t)
        want = (
            con.execute(J.rolling_window_oracle_sql(window_rows=5))
            .df().sort_values("event_id").reset_index(drop=True)
        )
        assert got["roll_n"].tolist() == want["roll_n"].tolist()
        assert got["roll_value_micro"].tolist() == want["roll_value_micro"].tolist()

    def test_window_one_equals_value(self, ray_session):
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        t = self._events(n=60, keys=3)
        got = (
            J.rolling_window(
                rd.from_arrow(t), "user_id", "ts", "event_id", "value",
                window_rows=1,
            )
            .to_pandas()
        )
        assert (got["roll_n"] == 1).all()

    def test_window_huge_equals_cumulative(self, ray_session):
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        t = self._events(n=100, keys=4)
        roll = (
            J.rolling_window(
                rd.from_arrow(t), "user_id", "ts", "event_id", "value",
                window_rows=10_000,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        cum = (
            J.cumulative_window(
                rd.from_arrow(t), "user_id", "ts", "event_id", "value"
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        assert roll["roll_n"].tolist() == cum["cum_n"].tolist()
        assert roll["roll_value_micro"].tolist() == cum["cum_value_micro"].tolist()

    def test_bad_window_rejected(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        with _pytest.raises(ValueError):
            J.rolling_window(
                rd.from_arrow(self._events(10)), "user_id", "ts", "event_id",
                "value", window_rows=0,
            )


class TestRollingTimeWindow:
    def _events(self, n=300, keys=5, seed=6):
        import numpy as np

        rng = np.random.default_rng(seed)
        return pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                rng.integers(0, 30, n) * 1_000_000, pa.timestamp("us")
            ),
            "user_id": pa.array(rng.integers(0, keys, n), pa.int64()),
            "value": pa.array(
                [None if i % 7 == 0 else round(float(rng.normal()), 6)
                 for i in range(n)],
                pa.float64(),
            ),
        })

    def test_matches_sql_and_bucket_invariant(self, ray_session):
        import duckdb
        import pandas.testing as pdt
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        t = self._events()
        got = (
            J.rolling_time_window(
                rd.from_arrow(t).repartition(5), "user_id", "ts", "event_id",
                "value", range_us=5_000_000, n_buckets=3,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        got2 = (
            J.rolling_time_window(
                rd.from_arrow(t).repartition(1), "user_id", "ts", "event_id",
                "value", range_us=5_000_000, n_buckets=64,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        pdt.assert_frame_equal(got, got2)
        con = duckdb.connect()
        con.register("events", t)
        want = (
            con.execute(J.rolling_time_oracle_sql(range_us=5_000_000))
            .df().sort_values("event_id").reset_index(drop=True)
        )
        assert got["range_n"].tolist() == want["range_n"].tolist()
        assert got["range_value_micro"].tolist() == want["range_value_micro"].tolist()

    def test_equal_ts_peers_all_in_frame(self, ray_session):
        # RANGE includes every row sharing the current ts, whatever the
        # tie order — both peers must see n = 2
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        t = pa.table({
            "event_id": pa.array([0, 1], pa.int64()),
            "ts": pa.array([1_000_000, 1_000_000], pa.timestamp("us")),
            "user_id": pa.array([7, 7], pa.int64()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        })
        got = (
            J.rolling_time_window(
                rd.from_arrow(t), "user_id", "ts", "event_id", "value",
                range_us=0,
            )
            .to_pandas()
        )
        assert got["range_n"].tolist() == [2, 2]
        assert got["range_value_micro"].tolist() == [3_000_000, 3_000_000]

    def test_zero_range_is_peers_only(self, ray_session):
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import joins as J

        t = pa.table({
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array([0, 1_000_000, 2_000_000], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "value": pa.array([1.0, 1.0, 1.0], pa.float64()),
        })
        got = (
            J.rolling_time_window(
                rd.from_arrow(t), "user_id", "ts", "event_id", "value",
                range_us=0,
            )
            .to_pandas().sort_values("event_id")
        )
        assert got["range_n"].tolist() == [1, 1, 1]
