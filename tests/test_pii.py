"""PII scan/redact: kernel goldens, null propagation, pattern-order
dependence, SQL-oracle parity (same RE2 engine on both sides), Ray path."""

import duckdb
import pyarrow as pa

import ray.data as rd

from duckdb_raquet_ray.pipelines import pii

DOCS = [
    (0, "reach me at bob.smith+spam@example.co.uk thanks"),
    (1, "server 10.0.0.1 and 192.168.255.3 up, 999.999.999.999 also matches the shape"),
    (2, "call 555-123-4567 or 555-000-9999"),
    (3, "no pii here at all"),
    (4, "a@b.io next to 1.2.3.4 and 111-222-3333"),
    (5, None),
    (6, ""),
]


def _table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([s for _, s in DOCS], pa.string()),
        }
    )


class TestScanKernel:
    def test_golden_counts(self):
        out = pii.pii_scan_batch(_table()).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_email"] == 1
        assert out.loc[1, "n_ipv4"] == 3  # the shape, not valid-octet semantics
        assert out.loc[2, "n_phone"] == 2
        assert out.loc[3].drop("text").sum() == 0
        assert out.loc[4, ["n_email", "n_ipv4", "n_phone"]].tolist() == [1, 1, 1]
        assert out.loc[6, ["n_email", "n_ipv4", "n_phone"]].tolist() == [0, 0, 0]

    def test_null_text_propagates(self):
        out = pii.pii_scan_batch(_table()).to_pandas().set_index("doc_id")
        assert out.loc[5, ["n_email", "n_ipv4", "n_phone"]].isna().all()


class TestRedactKernel:
    def test_golden_redaction(self):
        out = pii.pii_redact_batch(_table()).to_pandas().set_index("doc_id")
        assert out.loc[0, "text_redacted"] == "reach me at [EMAIL] thanks"
        assert out.loc[2, "text_redacted"] == "call [PHONE] or [PHONE]"
        assert out.loc[3, "text_redacted"] == "no pii here at all"
        assert out.loc[4, "text_redacted"] == "[EMAIL] next to [IP] and [PHONE]"
        assert out.loc[5, "text_redacted"] is None

    def test_email_redacted_before_ip_pattern_sees_domain(self):
        # "user@10.0.0.1.host.com" — the email pattern swallows the whole
        # address first; applying IP first would leave "user@[IP].host.com"
        t = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": ["user@10.0.0.1.host.com"]}
        )
        out = pii.pii_redact_batch(t).column("text_redacted").to_pylist()
        assert out == ["[EMAIL]"]


class TestOracleParity:
    def _con(self):
        con = duckdb.connect()
        vals = ", ".join(
            f"({i}, {'NULL' if s is None else repr(s)})" for i, s in DOCS
        )
        con.execute(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) v(doc_id, text)")
        return con

    def test_scan_matches_sql(self):
        mine = pii.pii_scan_batch(_table()).to_pandas().sort_values("doc_id")
        oracle = self._con().execute(pii.pii_scan_oracle_sql()).df().sort_values("doc_id")
        for c in ("n_email", "n_ipv4", "n_phone"):
            assert mine[c].fillna(-1).tolist() == oracle[c].fillna(-1).tolist()

    def test_redact_matches_sql(self):
        mine = pii.pii_redact_batch(_table()).to_pandas().sort_values("doc_id")
        oracle = self._con().execute(pii.pii_redact_oracle_sql()).df().sort_values("doc_id")
        assert mine["text_redacted"].fillna("¤").tolist() == oracle["text_redacted"].fillna("¤").tolist()


class TestRayPath:
    def test_scan_and_redact_stream(self, ray_session):
        ds = rd.from_arrow(_table())
        scanned = {r["doc_id"]: r["n_phone"] for r in pii.pii_scan(ds).take_all()}
        assert scanned[2] == 2 and scanned[3] == 0
        red = {r["doc_id"]: r["text_redacted"] for r in pii.pii_redact(ds).take_all()}
        assert red[0] == "reach me at [EMAIL] thanks"


class TestCli:
    def test_cli_pii_scan_and_redact(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from duckdb_raquet_ray import cli

        src = tmp_path / "docs.parquet"
        pq.write_table(_table(), src)
        dest = tmp_path / "scanned"
        cli.main(["pii", "--input", str(src), "--dest", str(dest)])
        out = pq.read_table(str(dest))
        assert {"n_email", "n_ipv4", "n_phone"} <= set(out.column_names)
        assert "text_redacted" not in out.column_names
        dest2 = tmp_path / "redacted"
        cli.main(["pii", "--input", str(src), "--dest", str(dest2), "--redact"])
        out2 = pq.read_table(str(dest2)).to_pandas().set_index("doc_id")
        assert out2.loc[0, "text_redacted"] == "reach me at [EMAIL] thanks"
        assert out2.loc[2, "n_phone"] == 2


class TestUrlScan:
    def _table(self):
        return pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "go to https://a.b.c/x and http://d.e/f now",
                        "no urls at all",
                        None,
                        "ftp://not.matched and https://only.this",
                    ]
                ),
            }
        )

    def test_golden(self):
        out = pii.url_scan_batch(self._table()).to_pandas().set_index("doc_id")
        assert out["n_urls"].tolist()[:2] == [2, 0]
        assert out.loc[0, "domain"] == "a.b.c"
        assert out.loc[1, "domain"] == ""  # DuckDB regexp_extract no-match
        import pandas as pd

        assert out.loc[2, "domain"] is None and pd.isna(out.loc[2, "n_urls"])
        assert out.loc[3, "domain"] == "only.this"

    def test_sql_parity(self):
        t = self._table()
        con = duckdb.connect()
        con.register("docs_arrow", t)
        mine = pii.url_scan_batch(t).select(["doc_id", "n_urls", "domain"]).to_pandas()
        oracle = con.execute(pii.url_scan_oracle_sql("docs_arrow")).df()
        assert mine["domain"].fillna("¤").tolist() == oracle["domain"].fillna("¤").tolist()
        assert mine["n_urls"].fillna(-1).tolist() == oracle["n_urls"].fillna(-1).tolist()

    def test_domain_counts(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(
                    ["https://x.org/a", "https://x.org/b", "https://y.io",
                     "plain", "https://x.org/c", None]
                ),
            }
        )
        out = pii.domain_counts(rd.from_arrow(t))
        assert out.column("domain").to_pylist() == ["x.org", "y.io"]
        assert out.column("cnt").to_pylist() == [3, 1]


class TestSentenceStats:
    def test_golden_and_sql_parity(self, ray_session):
        from duckdb_raquet_ray.pipelines import text as tx

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "One two. Three four! Five?", "no terminal punct", "",
                None, "...!!!  ",
            ]),
        })
        out = tx.sentence_stats_batch(t).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_sentences"] == 3 and out.loc[0, "sent_chars"] == 21
        assert out.loc[1, "n_sentences"] == 1
        assert out.loc[2, "n_sentences"] == 0 and out.loc[4, "n_sentences"] == 0
        import pandas as pd

        assert pd.isna(out.loc[3, "n_sentences"])
        con = duckdb.connect()
        con.register("docs_arrow", t)
        odf = con.execute(tx.sentence_oracle_sql("docs_arrow")).df().set_index("doc_id")
        for c in ("n_sentences", "sent_chars"):
            assert out[c].fillna(-1).tolist() == odf[c].fillna(-1).tolist()
        # ray path
        got = tx.sentence_stats(rd.from_arrow(t)).count()
        assert got == 5


class TestNormalizeText:
    def test_golden_and_sql_parity(self, ray_session):
        from duckdb_raquet_ray.pipelines import text as tx

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "Mixed CASE  and\ttabs ",
                "plain ascii",
                "",
                None,
                "composed Á decomposed Á nbsp kept",
            ]),
        })
        out = tx.normalize_text_batch(t)
        texts = out.column("text").to_pylist()
        assert texts[0] == "mixed case and tabs"
        assert texts[1] == "plain ascii"
        assert texts[2] == "" and texts[3] is None
        # both acute forms normalize to the same composed code point;
        # NBSP is not RE2 \s, so it survives (parity with DuckDB)
        assert texts[4] == "composed á decomposed á nbsp kept"
        assert out.column("n_chars").to_pylist() == [19, 11, 0, None, len(texts[4])]
        con = duckdb.connect()
        con.register("docs_arrow", t)
        odf = con.execute(tx.normalize_oracle_sql("docs_arrow")).df()
        assert odf["text"].tolist()[:3] == texts[:3]
        assert odf["text"].tolist()[4] == texts[4]

    def test_mangle_twins_and_ray_path(self, ray_session):
        from duckdb_raquet_ray.pipelines import text as tx

        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a roundabout option", "no vowel-free zone"]),
        })
        mangled = tx.mangle_unicode_batch(t)
        con = duckdb.connect()
        con.register("docs_arrow", t)
        odf = con.execute(
            f"SELECT * FROM {tx.mangle_unicode_sql('docs_arrow')} ORDER BY doc_id"
        ).df()
        assert mangled.column("text").to_pylist() == odf["text"].tolist()
        got = tx.normalize_text(
            rd.from_arrow(t).map_batches(
                tx.mangle_unicode_batch, batch_format="pyarrow"
            )
        ).take_all()
        assert len(got) == 2 and all("\u00f3" in r["text"] for r in got)
        assert "\u00e1" in next(r["text"] for r in got if r["doc_id"] == 0)


class TestTokenizeHashed:
    def test_golden_and_sql_parity(self, ray_session):
        from duckdb_raquet_ray.pipelines import text as tx
        from duckdb_raquet_ray.pipelines import transforms as tr
        from duckdb_raquet_ray.functions import detmix

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["alpha beta alpha", None, ""]),
        })
        out = tx.tokenize_hashed_batch(t)
        # null-text doc dropped; '' -> one empty-string word
        assert out.column("doc_id").to_pylist() == [0, 2]
        assert out.column("n_tok").to_pylist() == [3, 1]
        toks = out.column("tokens").to_pylist()
        assert toks[0][0] == toks[0][2] != toks[0][1]  # same word, same id
        import numpy as np

        expect = (
            detmix.string_hash64(np.array(["alpha", "beta"], object))
            % np.uint64(50_257)
        ).astype(int)
        assert toks[0] == [expect[0], expect[1], expect[0]]
        con = duckdb.connect()
        con.register("docs_arrow", t)
        odf = (
            con.execute(tx.tokenize_oracle_sql("docs_arrow"))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        posw = tr.position_weighted(out, id_cols=("doc_id", "n_tok"))
        got = posw.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got[odf.columns.tolist()].equals(odf)

    def test_ray_path_feeds_packing_shape(self, ray_session):
        from duckdb_raquet_ray.pipelines import text as tx

        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        out = tx.tokenize_hashed(ds).take_all()
        assert len(out) == 500
        assert all(r["n_tok"] == len(r["tokens"]) for r in out[:20])


URL_DOCS = [
    (0, "see https://site8.example.org/page0 now"),          # exact blocked host
    (1, "see https://a.b.site8.example.org/x deep subdomain"),  # subdomain of blocked
    (2, "see https://site9.example.org/ok fine"),            # unblocked sibling
    (3, "see https://notsite8.example.org/ok fine"),         # prefix must NOT match
    (4, "see https://spam.example.net trailing-end"),        # blocked at end of text
    (5, "mentions site8.example.org without scheme"),        # no url: not blocked
    (6, None),
    (7, ""),
    (8, "two https://ok.example.com/x then https://site14.example.org/y"),
]
BLOCKED = ["site8.example.org", "site14.example.org", "spam.example.net"]


def _url_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in URL_DOCS], pa.int64()),
            "text": pa.array([s for _, s in URL_DOCS], pa.string()),
        }
    )


def _url_values_src() -> str:
    vals = ", ".join(
        f"({i}, {'NULL' if s is None else repr(s)})" for i, s in URL_DOCS
    )
    return f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))"


class TestUrlBlocklist:
    def test_semantics(self, ray_session):
        kept = (
            pii.url_blocklist_filter(rd.from_arrow(_url_table()), BLOCKED)
            .to_pandas()["doc_id"]
            .tolist()
        )
        # 0: exact host, 1: subdomain, 4: end-of-text, 8: second url -> blocked
        assert sorted(kept) == [2, 3, 5, 6, 7]

    def test_keep_blocked_audit_side(self, ray_session):
        blocked = (
            pii.url_blocklist_filter(
                rd.from_arrow(_url_table()), BLOCKED, keep_blocked=True
            )
            .to_pandas()["doc_id"]
            .tolist()
        )
        assert sorted(blocked) == [0, 1, 4, 8]

    def test_oracle_parity(self, ray_session):
        mine = (
            pii.url_blocklist_filter(rd.from_arrow(_url_table()), BLOCKED)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = (
            duckdb.sql(pii.url_blocklist_oracle_sql(BLOCKED, _url_values_src()))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert mine["doc_id"].tolist() == ref["doc_id"].tolist()
        assert mine["url_blocked"].tolist() == ref["url_blocked"].tolist()

    def test_regex_metachars_escaped(self):
        # a '.' in a blocked domain must not match an arbitrary char
        pat = pii._blocklist_pattern(["a.com"])
        import pyarrow.compute as pc

        m = pc.match_substring_regex(
            pa.array(["https://axcom/x", "https://a.com/x"]), pat
        ).to_pylist()
        assert m == [False, True]

    def test_empty_blocklist_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="empty blocklist"):
            pii._blocklist_pattern([])
