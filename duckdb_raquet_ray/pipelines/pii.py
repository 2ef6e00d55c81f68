"""PII detection and redaction — the training-data hygiene stage that
scrubs contact information (emails, IPv4 addresses, phone numbers) before
a corpus is packed for training (the published C4/Dolma-style scrub).
No reference analogue (training-data-pipeline first-class op, like
`pipelines/contamination`); the closest reference shape is the
per-value classification kernel family
(/root/reference/src/raster_operations.cpp ST_ColorMapRaquet).

Scale contract (100 TB): both operators are a single stateless
`map_batches` pass — no shuffle, no driver state, no per-row Python. The
kernels are pyarrow `count_substring_regex` / `replace_substring_regex`,
i.e. RE2 running over the Arrow string buffer in C++.

Determinism / oracle: pyarrow's regex engine IS RE2 — the same engine
DuckDB's regexp_* functions use — so counts and replacements are
engine-identical by construction, not merely pattern-compatible: the
whole operator carries full value oracles (`pii_scan_oracle_sql`,
`pii_redact_oracle_sql`). Patterns deliberately use only the common
RE2 core (char classes, bounded repeats, non-capturing groups, \b).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ordered: redaction applies top-to-bottom, and the SQL replica must
# nest regexp_replace in the SAME order for byte parity (an email's
# domain can contain digit runs an IP/phone pattern could otherwise see)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}(?:\.\d{1,3}){3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
]


def _text_array(batch: pa.Table, text_col: str) -> pa.Array:
    col = batch.column(text_col)
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def pii_scan_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append `n_<kind>` int64 match counts per document (independent
    scans of the ORIGINAL text — counts don't interact the way sequential
    redaction does). Null text propagates to null counts, matching SQL."""
    arr = _text_array(batch, text_col)
    for kind, pattern, _ in PII_PATTERNS:
        n = pc.count_substring_regex(arr, pattern).cast(pa.int64())
        batch = batch.append_column(f"n_{kind}", n)
    return batch


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append `<text_col>_redacted`: every match replaced by its sentinel
    token, patterns applied in PII_PATTERNS order."""
    arr = _text_array(batch, text_col)
    for _, pattern, token in PII_PATTERNS:
        arr = pc.replace_substring_regex(arr, pattern, token)
    return batch.append_column(f"{text_col}_redacted", arr)


def pii_scan(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    return ds.map_batches(
        lambda b: pii_scan_batch(b, text_col), batch_format="pyarrow"
    )


def pii_redact(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    return ds.map_batches(
        lambda b: pii_redact_batch(b, text_col), batch_format="pyarrow"
    )


def synthesize_pii_batch(
    batch: pa.Table, *, key_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Deterministically splice synthetic PII (email / IPv4 / phone) into
    each row's text — a pure function of the integer key, for exercising
    the scan/redact oracles on digit-free corpora. The SQL twin is
    `synthesize_pii_sql`."""
    import pandas as pd

    ids = pd.Series(batch.column(key_col).to_numpy(zero_copy_only=False))
    s = ids.astype(str)
    txt = batch.column(text_col).to_pandas().fillna("").reset_index(drop=True)
    email = (" mail user" + s + "@m" + (ids % 7).astype(str) + ".org").where(
        ids % 3 != 0, ""
    )
    ip = (" ip 10." + (ids % 200).astype(str) + ".0." + (ids % 250).astype(str)).where(
        ids % 5 != 1, ""
    )
    phone = (
        " call 555-" + (ids % 900 + 100).astype(str)
        + "-" + (ids * 7 % 9000 + 1000).astype(str)
    ).where(ids % 4 == 2, "")
    aug = txt + email + ip + phone
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, pa.array(aug, pa.string())
    )


def synthesize_pii_sql(
    table: str = "documents", *, key_col: str = "doc_id", text_col: str = "text"
) -> str:
    """SQL twin of synthesize_pii_batch, as a subquery."""
    return (
        f"(SELECT {key_col}, coalesce({text_col}, '') || "
        f"CASE WHEN {key_col} % 3 <> 0 THEN ' mail user' || {key_col}::VARCHAR || "
        f"'@m' || ({key_col} % 7)::VARCHAR || '.org' ELSE '' END || "
        f"CASE WHEN {key_col} % 5 <> 1 THEN ' ip 10.' || ({key_col} % 200)::VARCHAR || "
        f"'.0.' || ({key_col} % 250)::VARCHAR ELSE '' END || "
        f"CASE WHEN {key_col} % 4 = 2 THEN ' call 555-' || ({key_col} % 900 + 100)::VARCHAR || "
        f"'-' || (({key_col} * 7) % 9000 + 1000)::VARCHAR ELSE '' END AS {text_col} "
        f"FROM {table})"
    )


def pii_scan_oracle_sql(
    table: str = "documents", *, text_col: str = "text", key_col: str = "doc_id"
) -> str:
    """DuckDB replica of pii_scan: len(regexp_extract_all(...)) per
    pattern — RE2 on both sides, so counts are engine-identical."""
    counts = ", ".join(
        f"len(regexp_extract_all({text_col}, '{pattern}'))::BIGINT AS n_{kind}"
        for kind, pattern, _ in PII_PATTERNS
    )
    return f"SELECT {key_col}, {counts} FROM {table}"


def pii_redact_oracle_sql(
    table: str = "documents", *, text_col: str = "text", key_col: str = "doc_id"
) -> str:
    """DuckDB replica of pii_redact: regexp_replace(..., 'g') nested in
    PII_PATTERNS order."""
    expr = text_col
    for _, pattern, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pattern}', '{token}', 'g')"
    return f"SELECT {key_col}, {expr} AS {text_col}_redacted FROM {table}"


# ---------------------------------------------------------------------------
# URL / domain extraction (web-pipeline staple: domain stats feed
# blocklists and per-domain mixture weights)
# ---------------------------------------------------------------------------

URL_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def url_scan_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append `n_urls` (RE2 match count) and `domain` (host of the FIRST
    url, '' when none — matching DuckDB regexp_extract's no-match '')."""
    arr = _text_array(batch, text_col)
    n = pc.count_substring_regex(arr, URL_PATTERN).cast(pa.int64())
    ex = pc.extract_regex(arr, r"https?://(?P<d>[A-Za-z0-9.-]+)")
    dom = pc.coalesce(pc.struct_field(ex, "d"), pa.scalar("", pa.string()))
    # null text stays null in counts but must stay null in domain too
    dom = pc.if_else(pc.is_null(arr), pa.scalar(None, pa.string()), dom)
    return batch.append_column("n_urls", n).append_column("domain", dom)


def url_scan(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    return ds.map_batches(
        lambda b: url_scan_batch(b, text_col), batch_format="pyarrow"
    )


def domain_counts(
    ds: rd.Dataset, text_col: str = "text", top: int = 20
) -> "pa.Table":
    """Top domains by document count (first-url host per doc): streaming
    url_scan -> groupby on the domain column -> DATASET-SIDE sort+limit,
    so only `top` rows ever reach the driver. The web's distinct
    registrable domains are ~10^8 at corpus scale — a take_all() of the
    full groupby (the round-3 shape) would materialize them all
    driver-side; sort+limit keeps the cut distributed. The shuffle
    payload is one short string per doc."""
    counted = (
        url_scan(ds, text_col)
        .filter(expr="domain != ''")
        .groupby("domain")
        .count()
    )
    top_ds = counted.sort(
        ["count()", "domain"], descending=[True, False]
    ).limit(int(top))
    t = pa.Table.from_pylist(top_ds.take_all())
    if t.num_rows == 0:
        return pa.table(
            {"domain": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    # name-based mapping: a column-order change in Ray's groupby-count
    # output must not silently swap domains and counts. The local sort_by
    # re-asserts the (cnt desc, domain asc) order limit() preserved.
    t = pa.table(
        {
            "domain": t.column("domain"),
            "cnt": t.column("count()").cast(pa.int64()),
        }
    )
    return t.sort_by([("cnt", "descending"), ("domain", "ascending")]).slice(0, top)


def url_scan_oracle_sql(
    table: str = "documents", *, text_col: str = "text", key_col: str = "doc_id"
) -> str:
    """DuckDB replica of url_scan (RE2 both sides)."""
    return (
        f"SELECT {key_col}, "
        f"len(regexp_extract_all({text_col}, '{URL_PATTERN}'))::BIGINT AS n_urls, "
        f"regexp_extract({text_col}, '{URL_PATTERN}', 1) AS domain "
        f"FROM {table}"
    )


def domain_counts_oracle_sql(
    table: str = "documents", *, text_col: str = "text", top: int = 20
) -> str:
    """DuckDB replica of domain_counts."""
    return (
        f"SELECT regexp_extract({text_col}, '{URL_PATTERN}', 1) AS domain, "
        f"count(*)::BIGINT AS cnt FROM {table} "
        f"WHERE regexp_extract({text_col}, '{URL_PATTERN}', 1) <> '' "
        f"GROUP BY domain ORDER BY cnt DESC, domain LIMIT {int(top)}"
    )


def _blocklist_pattern(blocked: list[str]) -> str:
    """ONE RE2 alternation matching any url whose host IS a blocked
    domain or a subdomain of one. RE2 has no lookaheads, so the
    host-boundary is asserted by consuming one non-host char (or end).
    Compiled once at plan time; O(1) regex passes per batch regardless
    of blocklist length."""
    import re as _re

    if not blocked:
        raise ValueError("empty blocklist")
    # (?i): schemes and hostnames are case-insensitive in practice —
    # without it 'https://EVIL.com' bypasses a lowercase blocklist. RE2
    # supports the inline flag identically in pyarrow and DuckDB, so the
    # SQL twin stays pattern-identical.
    alts = "|".join(_re.escape(d.lower()) for d in sorted(blocked))
    return rf"(?i)https?://([A-Za-z0-9.-]+\.)?({alts})([^A-Za-z0-9.-]|$)"


def url_blocklist_filter(
    ds: rd.Dataset,
    blocked: list[str],
    *,
    text_col: str = "text",
    keep_blocked: bool = False,
) -> rd.Dataset:
    """Drop (or keep, for audit) docs containing a url on a blocked
    domain — the C4/RefinedWeb URL-filter step. Appends `url_blocked`
    (bool) and filters; null text is never blocked. Stateless
    map_batches, the single fused regex broadcast in the task closure —
    no shuffle, nothing corpus-sized anywhere."""
    pat = _blocklist_pattern(blocked)

    def f(batch: pa.Table) -> pa.Table:
        arr = _text_array(batch, text_col)
        m = pc.fill_null(pc.match_substring_regex(arr, pat), False)
        out = batch.append_column("url_blocked", m)
        return out.filter(m if keep_blocked else pc.invert(m))

    return ds.map_batches(f, batch_format="pyarrow")


def url_blocklist_oracle_sql(
    blocked: list[str],
    table: str = "documents",
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    keep_blocked: bool = False,
) -> str:
    """DuckDB replica (regexp_matches — RE2, same pattern string)."""
    pat = _blocklist_pattern(blocked).replace("'", "''")
    cond = f"coalesce(regexp_matches({text_col}, '{pat}'), FALSE)"
    want = cond if keep_blocked else f"NOT {cond}"
    return (
        f"SELECT *, {cond} AS url_blocked FROM {table} WHERE {want}"
    )


def synthesize_urls_batch(
    batch: pa.Table, *, key_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Splice a deterministic URL into every even-keyed row's text (pure
    function of the key) — for exercising the URL oracles on URL-free
    corpora. SQL twin: `synthesize_urls_sql`."""
    import pandas as pd

    ids = pd.Series(batch.column(key_col).to_numpy(zero_copy_only=False))
    txt = batch.column(text_col).to_pandas().fillna("").reset_index(drop=True)
    url = (
        " see https://site" + (ids % 50).astype(str)
        + ".example.org/page" + ids.astype(str)
    ).where(ids % 2 == 0, "")
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col,
        pa.array(txt + url, pa.string()),
    )


def synthesize_urls_sql(
    table: str = "documents", *, key_col: str = "doc_id", text_col: str = "text"
) -> str:
    """SQL twin of synthesize_urls_batch, as a subquery."""
    return (
        f"(SELECT {key_col}, coalesce({text_col}, '') || "
        f"CASE WHEN {key_col} % 2 = 0 THEN ' see https://site' || "
        f"({key_col} % 50)::VARCHAR || '.example.org/page' || {key_col}::VARCHAR "
        f"ELSE '' END AS {text_col} FROM {table})"
    )
