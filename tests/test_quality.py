"""Repetition-metrics and global-DF scoring operators: kernel goldens,
SQL-oracle parity, batch-split determinism, top_n cap, end-to-end Ray
path, and schema-metadata hygiene."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from duckdb_raquet_ray.pipelines import quality as q

DOCS = [
    (1, "a b a b a b c"),  # heavy 2-gram repetition
    (2, "x y z x y z x y"),
    (3, "unique words only here"),
    (4, "solo"),  # fewer words than n
    (5, ""),  # empty text
    (6, "a  b   a b"),  # whitespace runs: split parity
]


def _table(docs=DOCS) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": [s for _, s in docs],
        }
    )


def _values_src(docs=DOCS) -> str:
    vals = ", ".join(f"({i}, '{s}')" for i, s in docs)
    return f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))"


REP_COLS = [
    "doc_id",
    "n_words",
    "n_grams",
    "distinct_grams",
    "dup_gram_positions",
    "top_word_count",
]


class TestRepetition:
    def test_ngram_order_below_one_rejected(self):
        with pytest.raises(ValueError, match="n-gram order"):
            q.repetition_batch(_table(), n=0)

    def test_golden_metrics(self):
        out = (
            q.repetition_batch(_table(), n=2)
            .select(REP_COLS)
            .to_pandas()
            .set_index("doc_id")
        )
        # doc 1 "a b a b a b c": grams ab,ba,ab,ba,ab,bc -> ab x3 + ba x2
        assert out.loc[1].tolist() == [7, 6, 3, 5, 3]
        # doc 3: all words and grams unique
        assert out.loc[3].tolist() == [4, 3, 3, 0, 1]
        # doc 4 "solo": one word, zero grams (not -1)
        assert out.loc[4].tolist() == [1, 0, 0, 0, 1]
        # doc 5 empty: all zeros
        assert out.loc[5].tolist() == [0, 0, 0, 0, 0]

    def test_sql_oracle_parity(self):
        mine = (
            q.repetition_batch(_table(), n=2)
            .select(REP_COLS)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.connect()
            .execute(q.repetition_oracle_sql(_values_src()))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in REP_COLS:
            assert mine[c].tolist() == oracle[c].tolist(), c

    def test_trigram_parity(self):
        mine = (
            q.repetition_batch(_table(), n=3)
            .select(REP_COLS)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.connect()
            .execute(q.repetition_oracle_sql(_values_src(), n=3))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in REP_COLS:
            assert mine[c].tolist() == oracle[c].tolist(), c

    def test_batch_split_invariance(self):
        t = _table()
        whole = q.repetition_batch(t).select(REP_COLS).to_pandas()
        parts = pa.concat_tables(
            [q.repetition_batch(t.slice(0, 2)), q.repetition_batch(t.slice(2))]
        ).select(REP_COLS).to_pandas()
        assert whole.equals(parts)


class TestDfScore:
    def _df_table(self, t):
        lens, wh = q._flat_word_hashes(t, "text")
        _, w_u = q._distinct_doc_words(lens, wh)
        u, c = np.unique(w_u, return_counts=True)
        return u, c.astype(np.int64)

    def test_golden_df(self):
        t = _table()
        probe = q._DfScoreProbe(self._df_table(t), "text")
        out = probe(t).select(["doc_id", "n_distinct_words", "df_sum"]).to_pandas()
        out = out.set_index("doc_id")
        # "a" appears in docs 1 and 6 -> df 2; doc 6 distinct {a,b} -> 2+2
        assert out.loc[6].tolist() == [2, 4]
        assert out.loc[4].tolist() == [1, 1]  # "solo" only in doc 4
        assert out.loc[5].tolist() == [0, 0]

    def test_sql_oracle_parity(self):
        t = _table()
        probe = q._DfScoreProbe(self._df_table(t), "text")
        mine = (
            probe(t)
            .select(["doc_id", "n_distinct_words", "df_sum"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.connect()
            .execute(q.df_score_oracle_sql(_values_src()))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in ("doc_id", "n_distinct_words", "df_sum"):
            assert mine[c].tolist() == oracle[c].tolist(), c

    def test_unknown_words_score_zero(self):
        t = _table()
        probe = q._DfScoreProbe(self._df_table(t), "text")
        other = pa.table(
            {"doc_id": pa.array([9], pa.int64()), "text": ["never seen tokens"]}
        )
        out = probe(other).to_pandas()
        assert out["df_sum"].tolist() == [0]
        assert out["n_distinct_words"].tolist() == [3]

    def test_empty_df_table(self):
        probe = q._DfScoreProbe(
            (np.zeros(0, np.uint64), np.zeros(0, np.int64)), "text"
        )
        out = probe(_table()).to_pandas()
        assert out["df_sum"].sum() == 0


class TestEndToEnd:
    def test_ray_path_matches_local(self, ray_session):
        import ray.data as rd

        t = _table()
        ds = rd.from_arrow(t)
        df_table = q.global_word_df(ds)
        lens, wh = q._flat_word_hashes(t, "text")
        _, w_u = q._distinct_doc_words(lens, wh)
        u, c = np.unique(w_u, return_counts=True)
        assert df_table[0].tolist() == u.tolist()
        assert df_table[1].tolist() == c.tolist()
        out = {
            r["doc_id"]: r["df_sum"]
            for r in q.doc_df_score(ds, df_table, concurrency=1).take_all()
        }
        local = q._DfScoreProbe(df_table, "text")(t).to_pandas()
        assert out == dict(zip(local["doc_id"], local["df_sum"]))
        rep = q.repetition_metrics(ds).take_all()
        assert {r["doc_id"]: r["dup_gram_positions"] for r in rep}[1] == 5

    def test_global_df_top_n_cap(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(_table())
        full = q.global_word_df(ds)
        capped = q.global_word_df(ds, top_n=3)
        assert len(capped[0]) == 3
        # the cap keeps the highest-df words; hashes stay sorted
        assert (np.diff(capped[0].astype(np.uint64)) > 0).all()
        top_dfs = sorted(full[1].tolist(), reverse=True)[:3]
        assert sorted(capped[1].tolist(), reverse=True) == top_dfs


class TestGopherFilter:
    def test_thresholds(self, ray_session):
        import ray.data as rd

        ds = q.repetition_metrics(rd.from_arrow(_table()))
        # doc 1: dup 5/6 grams, top 3/7 words; doc 3: dup 0/3
        kept = q.gopher_filter(ds, max_dup_frac=0.5).take_all()
        ids = sorted(r["doc_id"] for r in kept)
        assert 1 not in ids and 2 not in ids and 3 in ids
        # zero-gram and empty docs survive any dup threshold
        assert 4 in ids and 5 in ids
        # top-word rule: doc 4 "solo" has top 1/1 -> dropped at 0.9
        kept2 = q.gopher_filter(ds, max_top_frac=0.9).take_all()
        ids2 = sorted(r["doc_id"] for r in kept2)
        assert 4 not in ids2 and 3 in ids2 and 5 in ids2

    def test_cli_quality_and_decontaminate(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from duckdb_raquet_ray import cli

        src = tmp_path / "docs.parquet"
        pq.write_table(_table(), src)
        dest = tmp_path / "annotated"
        cli.main(["quality", "--input", str(src), "--dest", str(dest)])
        out = pq.read_table(str(dest))
        assert "dup_gram_positions" in out.column_names
        assert out.num_rows == len(DOCS)
        dest2 = tmp_path / "filtered"
        cli.main(["quality", "--input", str(src), "--dest", str(dest2),
                  "--max-dup-frac", "0.5"])
        out2 = pq.read_table(str(dest2))
        assert out2.num_rows < len(DOCS)
        # decontaminate: docs 1/2 as the benchmark side, 2-grams
        bench = tmp_path / "bench.parquet"
        pq.write_table(_table(DOCS[:2]), bench)
        dest3 = tmp_path / "decon"
        cli.main(["decontaminate", "--input", str(src), "--benchmark", str(bench),
                  "--dest", str(dest3), "--ngram", "2", "--drop"])
        out3 = pq.read_table(str(dest3))
        ids = sorted(out3.column("doc_id").to_pylist())
        # docs 1, 2 share their own grams; doc 6 shares "a b"; 3/4/5 clean
        assert ids == [3, 4, 5]


class TestSchemaMetadataHygiene:
    def test_stage_outputs_metadata_free(self):
        dirty = _table().replace_schema_metadata({"pandas": "{}"})
        lens, wh = q._flat_word_hashes(_table(), "text")
        _, w_u = q._distinct_doc_words(lens, wh)
        u, c = np.unique(w_u, return_counts=True)
        for out in (
            q.repetition_batch(dirty),
            q._DfScoreProbe((u, c.astype(np.int64)), "text")(dirty),
        ):
            assert out.schema.metadata is None
            hash(out.schema)


class TestCrossdocDup:
    """Cross-document duplicate n-grams: goldens on a crafted fixture,
    batch/bucket invariance, SQL-oracle parity."""

    def _table(self) -> pa.Table:
        shared = "one two three four five six seven eight"  # exactly 8 words = 1 gram at n=8
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        shared + " unique tail for doc one here",
                        shared + " other ending entirely different now",
                        "nothing in common with the rest at all honestly",
                        "short doc",  # < n words -> no output row
                    ]
                ),
            }
        )

    def test_golden_shared_gram(self, ray_session):
        import ray.data as rd

        out = {
            r["doc_id"]: (r["distinct_grams"], r["dup_grams"])
            for r in q.crossdoc_ngram_dup(rd.from_arrow(self._table())).take_all()
        }
        # docs 1 and 2 share exactly the one gram made of the 8 shared words
        assert out[1][1] == 1 and out[2][1] == 1
        assert out[3] == (2, 0)  # 9 words -> 2 grams, none shared
        assert 4 not in out  # fewer than n words: no grams, no row

    def test_bucket_count_invariant(self, ray_session):
        import ray.data as rd

        t = self._table()
        a = sorted(
            (r["doc_id"], r["distinct_grams"], r["dup_grams"])
            for r in q.crossdoc_ngram_dup(rd.from_arrow(t), n_buckets=2).take_all()
        )
        b = sorted(
            (r["doc_id"], r["distinct_grams"], r["dup_grams"])
            for r in q.crossdoc_ngram_dup(rd.from_arrow(t), n_buckets=256).take_all()
        )
        assert a == b

    def test_sql_oracle_parity(self, ray_session):
        import ray.data as rd

        t = self._table()
        mine = sorted(
            (r["doc_id"], r["distinct_grams"], r["dup_grams"])
            for r in q.crossdoc_ngram_dup(rd.from_arrow(t)).take_all()
        )
        con = duckdb.connect()
        con.register("docs_arrow", t)
        con.execute("CREATE VIEW documents AS SELECT * FROM docs_arrow")
        oracle = con.execute(q.crossdoc_dup_oracle_sql("documents")).df()
        theirs = sorted(
            (int(r.doc_id), int(r.distinct_grams), int(r.dup_grams))
            for r in oracle.itertuples()
        )
        assert mine == theirs


def test_crossdoc_string_keys_end_to_end(ray_session):
    # string doc keys: empty bucket partitions must emit STRING-typed key
    # blocks (a hardcoded int64 empty schema would conflict in the
    # downstream union/groupby-sum)
    import ray.data as rd

    docs = [
        ("doc-a", "one two three four five six seven eight nine"),
        ("doc-b", "one two three four five six seven eight ten"),
        ("doc-c", "totally different words in this tiny document here now"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.string()),
            "text": [s for _, s in docs],
        }
    )
    got = {
        r["doc_id"]: (r["distinct_grams"], r["dup_grams"])
        for r in q.crossdoc_ngram_dup(rd.from_arrow(t), n=8).take_all()
    }
    vals = ", ".join(f"('{k}', '{s}')" for k, s in docs)
    con = duckdb.connect()
    oracle = con.execute(
        q.crossdoc_dup_oracle_sql(
            f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))", n=8
        )
    ).df()
    want = {
        r.doc_id: (r.distinct_grams, r.dup_grams) for r in oracle.itertuples()
    }
    assert got == want


class TestSourceClassifier:
    CDOCS = [
        (1, "wiki", "the citation article encyclopedia section the"),
        (2, "wiki", "article with citation and references section"),
        (3, "wiki", "encyclopedia article neutral tone citation"),
        (4, "web", "click here buy now the best deals"),
        (5, "web", "subscribe now click the banner deals"),
        (6, "web", "best deals now buy subscribe click"),
        (7, "web", ""),  # empty text, negative class
    ]

    def _table(self):
        return pa.table(
            {
                "doc_id": pa.array([d for d, _, _ in self.CDOCS], pa.int64()),
                "source": [s for _, s, _ in self.CDOCS],
                "text": [t for _, _, t in self.CDOCS],
            }
        )

    def _values_src(self):
        vals = ", ".join(f"({i}, '{s}', '{t}')" for i, s, t in self.CDOCS)
        return f"(SELECT * FROM (VALUES {vals}) v(doc_id, source, text))"

    def _brute_table(self, top_n=2048):
        """Reference build: plain Python dict over the same hashes."""
        t = self._table()
        lens, wh = q._flat_word_hashes(t, "text")
        d_u, w_u = q._distinct_doc_words(lens, wh)
        labels = t.column("source").to_pylist()
        n_pos = sum(1 for s in labels if s == "wiki")
        n_neg = len(labels) - n_pos
        dfp, dfn = {}, {}
        for d, w in zip(d_u, w_u):
            if labels[d] == "wiki":
                dfp[w] = dfp.get(w, 0) + 1
            else:
                dfn[w] = dfn.get(w, 0) + 1
        words = sorted(set(dfp) | set(dfn))
        wt = {
            w: (dfp.get(w, 0) << q.CLS_SCALE_BITS) // n_pos
            - (dfn.get(w, 0) << q.CLS_SCALE_BITS) // n_neg
            for w in words
        }
        ranked = sorted(wt, key=lambda w: (-abs(wt[w]), w))[:top_n]
        kept = sorted(ranked)
        return (
            np.array(kept, np.uint64),
            np.array([wt[w] for w in kept], np.int64),
            n_pos,
            n_neg,
        )

    def test_brute_force_parity(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._table())
        wh, w, n_pos, n_neg = q.train_source_classifier(
            ds, positive=("wiki",), top_n=2048
        )
        bw, bwt, bp, bn = self._brute_table()
        assert (n_pos, n_neg) == (bp, bn)
        np.testing.assert_array_equal(wh, bw)
        np.testing.assert_array_equal(w, bwt)

    def test_top_n_cap_and_bucket_invariance(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._table())
        for nb in (2, 17, 256):
            wh, w, _, _ = q.train_source_classifier(
                ds, positive=("wiki",), top_n=4, n_buckets=nb
            )
            bw, bwt, _, _ = self._brute_table(top_n=4)
            np.testing.assert_array_equal(wh, bw)
            np.testing.assert_array_equal(w, bwt)
            assert q.LAST_CLS_DRIVER_ROWS <= nb * 4

    def test_score_separates_classes(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._table())
        table = q.train_source_classifier(ds, positive=("wiki",))
        out = {
            r["doc_id"]: (r["cls_score"], r["pred_pos"])
            for r in q.classifier_score(ds, table[:2], concurrency=1).take_all()
        }
        for d, s, _ in self.CDOCS:
            if not s:
                continue
            score, pred = out[d]
            if d == 7:
                assert score == 0 and pred == 0  # empty text scores zero
            else:
                assert pred == (1 if s == "wiki" else 0), (d, score)

    def test_sql_oracle_parity(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._table())
        table = q.train_source_classifier(ds, positive=("wiki",), top_n=5)
        got = (
            q.classifier_score(ds, table[:2], concurrency=1)
            .select_columns(["doc_id", "n_cls_hits", "cls_score", "pred_pos"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.connect()
            .execute(
                q.classifier_oracle_sql(
                    self._values_src(), positive=("wiki",), top_n=5
                )
            )
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["n_cls_hits"].tolist() == oracle["n_cls_hits"].tolist()
        assert got["cls_score"].tolist() == oracle["cls_score"].tolist()
        assert got["pred_pos"].tolist() == oracle["pred_pos"].astype(int).tolist()

    def test_single_class_rejected(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._table())
        with pytest.raises(ValueError, match="both classes"):
            q.train_source_classifier(ds, positive=("nosuch",))
        with pytest.raises(ValueError, match="non-empty"):
            q.train_source_classifier(ds, positive=())


class TestDocKeywords:
    KDOCS = [
        (1, "the cat sat on the mat the cat"),
        (2, "the dog ran and the dog barked dog dog"),
        (3, "the the the"),  # all stopwords after filtering
        (4, ""),
        (5, "zebra zebra quark"),
    ]

    def _table(self):
        return pa.table(
            {
                "doc_id": pa.array([d for d, _ in self.KDOCS], pa.int64()),
                "text": [s for _, s in self.KDOCS],
            }
        )

    def _values_src(self):
        vals = ", ".join(f"({i}, '{s}')" for i, s in self.KDOCS)
        return f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))"

    def test_sql_oracle_parity(self, ray_session):
        import ray.data as rd

        for stop_n, k in ((1, 2), (2, 3), (0, 1)):
            got = (
                q.doc_keywords(
                    rd.from_arrow(self._table()), k=k, stop_top_n=stop_n,
                    concurrency=1,
                )
                .to_pandas()
                .sort_values(["doc_id", "rank"])
                .reset_index(drop=True)
            )
            oracle = (
                duckdb.connect()
                .execute(
                    q.keywords_oracle_sql(self._values_src(), k=k, stop_top_n=stop_n)
                )
                .df()
                .sort_values(["doc_id", "rank"])
                .reset_index(drop=True)
            )
            assert got["doc_id"].tolist() == oracle["doc_id"].tolist(), (stop_n, k)
            assert got["rank"].tolist() == oracle["rank"].tolist()
            assert got["wh"].astype("uint64").tolist() == oracle["wh"].astype("uint64").tolist()
            assert got["tf"].tolist() == oracle["tf"].tolist()

    def test_stopword_and_rank_semantics(self, ray_session):
        import ray.data as rd

        # stop_top_n=1 drops "the" (highest df); doc 3 then emits nothing,
        # doc 2's top keyword is dog (tf 4)
        out = (
            q.doc_keywords(
                rd.from_arrow(self._table()), k=2, stop_top_n=1, concurrency=1
            )
            .to_pandas()
            .sort_values(["doc_id", "rank"])
        )
        assert 3 not in set(out["doc_id"])
        assert 4 not in set(out["doc_id"])
        d2 = out[out.doc_id == 2]
        assert d2.iloc[0]["tf"] == 4  # dog
        d5 = out[out.doc_id == 5]
        assert d5.iloc[0]["tf"] == 2  # zebra twice, then quark
        assert d5.iloc[1]["tf"] == 1


class TestRemoveDupSpans:
    """Duplicate-span removal: goldens on a crafted fixture (keeper rule,
    overlap union, intra-doc repeats kept), bucket invariance, string
    keys, SQL-oracle parity."""

    def _table(self) -> pa.Table:
        shared = "the quick brown fox jumps over the lazy dog near river bank today yes"
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "text": pa.array(
                    [
                        "Alpha beta " + shared + " gamma delta epsilon zeta eta theta",
                        "One two three " + shared + " four five six seven eight nine",
                        "no overlap here with anything else in this corpus at all today ok",
                        "tiny doc",
                        "",
                        shared,  # fully covered -> empty rewrite
                    ]
                ),
            }
        )

    def test_golden_keeper_and_coverage(self, ray_session):
        import ray.data as rd

        out = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in q.remove_dup_spans(rd.from_arrow(self._table()), n=8).take_all()
        }
        # doc 1 is the min-key keeper: nothing removed, whitespace-normalized
        assert out[1][1] == 0 and "quick brown fox" in out[1][0]
        # docs 2 and 6 lose the 14 shared words
        assert out[2] == ("One two three four five six seven eight nine", 14)
        assert out[6] == ("", 14)
        assert out[3][1] == 0 and out[4] == ("tiny doc", 0)
        assert out[5] == ("", 0)

    def test_bucket_invariance(self, ray_session):
        import ray.data as rd

        t = self._table()
        a = sorted(
            (r["doc_id"], r["text"], r["n_removed"])
            for r in q.remove_dup_spans(rd.from_arrow(t), n=8, n_buckets=2).take_all()
        )
        b = sorted(
            (r["doc_id"], r["text"], r["n_removed"])
            for r in q.remove_dup_spans(rd.from_arrow(t), n=8, n_buckets=31).take_all()
        )
        assert a == b

    def test_sql_oracle_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        t = self._table()
        eng = (
            q.remove_dup_spans(rd.from_arrow(t), n=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", t)
        ora = (
            con.execute(q.remove_dup_spans_oracle_sql("documents", n=8))
            .df().sort_values("doc_id").reset_index(drop=True)
        )
        assert eng["text"].tolist() == ora["text"].tolist()
        assert eng["n_removed"].tolist() == ora["n_removed"].tolist()

    def test_string_keys(self, ray_session):
        import ray.data as rd

        shared = "a b c d e f g h i j"  # 10 words: 3 grams at n=8
        t = pa.table(
            {
                "doc_id": pa.array(["zz", "aa"]),  # keeper = 'aa' (min string)
                "text": pa.array([shared + " tail words", shared + " more stuff"]),
            }
        )
        out = {
            r["doc_id"]: r["n_removed"]
            for r in q.remove_dup_spans(rd.from_arrow(t), n=8).take_all()
        }
        assert out["aa"] == 0 and out["zz"] == 10

    def test_intra_doc_repeat_in_keeper_kept(self, ray_session):
        import ray.data as rd

        span = "p q r s t u v w"  # one 8-gram
        t = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array([span + " mid " + span]),
            }
        )
        out = q.remove_dup_spans(rd.from_arrow(t), n=8).take_all()
        # sole doc is its own keeper: intra-doc repetition is NOT removed
        assert out[0]["n_removed"] == 0


def test_remove_dup_spans_duplicate_keys_raise(ray_session):
    import pytest as _pytest
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([5, 5], pa.int64()),
            "text": pa.array(["a b c d e f g h i", "a b c d e f g h j"]),
        }
    )
    with _pytest.raises(Exception, match="duplicate"):
        q.remove_dup_spans(rd.from_arrow(t), n=8).take_all()
