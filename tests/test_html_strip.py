"""HTML boilerplate strip: golden cases, SQL-oracle byte parity (strip
and mangle+strip composition), entity decode ordering, null/empty edges,
and the end-to-end Ray path."""

import duckdb
import pyarrow as pa
import ray.data as rd

from duckdb_raquet_ray.pipelines import text as T

DOCS = [
    (1, "plain words only"),
    (2, '<p>hello <b>world</b></p>'),
    (3, "<script>var x = '<div>';</script>visible"),
    (4, "<style>p { color: red }</style>styled"),
    (5, "<!-- secret -->shown"),
    (6, "a &amp;lt; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; c&nbsp;d"),
    (7, "spaced   <br/>   out"),
    (8, ""),
    (9, None),
    (10, "bare < sign and <UNCLOSED"),
]


def _table(docs=DOCS) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs], pa.string()),
        }
    )


def _values_src(docs=DOCS) -> str:
    vals = ", ".join(
        f"({i}, {'NULL' if s is None else chr(39) + s.replace(chr(39), chr(39) * 2) + chr(39)})"
        for i, s in docs
    )
    return f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))"


def _strip_map(docs=DOCS) -> dict:
    out = T.html_strip_batch(_table(docs)).to_pydict()
    return dict(zip(out["doc_id"], out["text"]))


class TestGolden:
    def test_tags_dropped_text_kept(self):
        m = _strip_map()
        assert m[1] == "plain words only"
        assert m[2] == "hello world"
        assert m[3] == "visible"
        assert m[4] == "styled"
        assert m[5] == "shown"

    def test_entity_order(self):
        # &amp;lt; -> literal '&lt;' (amp decodes LAST); &lt;tag&gt;
        # decodes AFTER tag strip so it survives as literal text
        assert _strip_map()[6] == "a &lt; b <tag> \"q\" 's' c d"

    def test_whitespace_collapse_and_trim(self):
        assert _strip_map()[7] == "spaced out"

    def test_null_and_empty(self):
        m = _strip_map()
        assert m[8] == "" and m[9] is None

    def test_n_stripped_counts_codepoints(self):
        out = T.html_strip_batch(_table()).to_pydict()
        n = dict(zip(out["doc_id"], out["n_stripped"]))
        assert n[1] == 0
        assert n[2] == len(DOCS[1][1]) - len("hello world")
        assert n[9] is None


class TestOracleParity:
    def test_strip_matches_duckdb(self):
        mine = T.html_strip_batch(_table()).to_pandas().sort_values("doc_id")
        ref = (
            duckdb.sql(T.html_strip_oracle_sql(_values_src()))
            .df()
            .sort_values("doc_id")
        )
        assert mine["text"].fillna("@").tolist() == ref["text"].fillna("@").tolist()
        assert (
            mine["n_stripped"].fillna(-1).tolist()
            == ref["n_stripped"].fillna(-1).tolist()
        )

    def test_mangle_strip_composition_matches_duckdb(self):
        m = T.html_mangle_batch(_table())
        mine = T.html_strip_batch(m).to_pandas().sort_values("doc_id")
        ref = (
            duckdb.sql(
                T.html_strip_oracle_sql(T.html_mangle_sql(_values_src()))
            )
            .df()
            .sort_values("doc_id")
        )
        assert mine["text"].fillna("@").tolist() == ref["text"].fillna("@").tolist()
        assert (
            mine["n_stripped"].fillna(-1).tolist()
            == ref["n_stripped"].fillna(-1).tolist()
        )


class TestRayPath:
    def test_dataset_pass(self, ray_session):
        out = (
            T.html_strip(rd.from_arrow(T.html_mangle_batch(_table())))
            .to_pandas()
            .sort_values("doc_id")
        )
        direct = (
            T.html_strip_batch(T.html_mangle_batch(_table()))
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["text"].fillna("@").tolist() == direct["text"].fillna("@").tolist()
