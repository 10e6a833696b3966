"""Round-4 continuation operators: line-level boilerplate removal
(ops/lines), ordered funnel counts (ops/window.funnel_counts), and the
per-column ingest profile (ops/profile.column_profile).

The SQL gate exercises the space-delimiter configuration of
strip_boilerplate (the synthetic docs are single-line); these tests cover
the REAL newline path plus the hand-checkable edge semantics the gate
can't reach (blank-line preservation, all-lines-dropped docs, out-of-order
funnel events, nulls / duplicate values in the profile).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(rows), dtype=np.int64)
                ),
                "text": pa.array(rows, type=pa.string()),
            }
        )
    )


class TestStripBoilerplate:
    def test_newline_boilerplate_removed_in_order(self):
        from raylink.ops.lines import strip_boilerplate

        docs = _docs(
            [
                "COOKIE BANNER\nreal content one\nFOOTER",
                "COOKIE BANNER\nreal content two\n\nFOOTER",
                "COOKIE BANNER\nunique middle\nFOOTER",
                "only original text here",
            ]
        )
        out = (
            strip_boilerplate(docs, min_docs=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["text_clean"].tolist() == [
            "real content one",
            "real content two\n",  # blank line survives
            "unique middle",
            "only original text here",
        ]
        assert out["n_dropped"].tolist() == [2, 2, 2, 0]
        assert out["n_kept"].tolist() == [1, 2, 1, 1]

    def test_all_lines_dropped_yields_empty_doc(self):
        from raylink.ops.lines import strip_boilerplate

        docs = _docs(["dup", "dup", "dup\nkeep me"])
        out = (
            strip_boilerplate(docs, min_docs=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["text_clean"].tolist() == ["", "", "keep me"]
        assert out["n_kept"].tolist() == [0, 0, 1]

    def test_within_doc_repeats_count_once(self):
        from raylink.ops.lines import line_frequencies

        docs = _docs(["x\nx\nx", "x\ny"])
        freq = line_frequencies(docs).to_pandas().set_index("line")["n_docs"]
        assert freq["x"] == 2  # not 4: distinct-doc frequency
        assert freq["y"] == 1

    def test_doc_frac_threshold_matches_integer_ceil(self):
        from raylink.ops.lines import strip_boilerplate

        # 5 docs, frac 1/2 -> threshold ceil(5/2)=3: a line in exactly 3
        # docs IS dropped, in 2 is kept
        rows = ["a\nb"] * 2 + ["a\nc"] + ["d"] * 2
        out = (
            strip_boilerplate(_docs(rows), doc_frac=(1, 2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # 'a' in 3 docs (dropped); 'b' in 2 (kept); 'd' in 2 (kept)
        assert out["text_clean"].tolist() == ["b", "b", "c", "d", "d"]

    def test_threshold_arg_validation(self):
        from raylink.ops.lines import strip_boilerplate

        with pytest.raises(ValueError):
            strip_boilerplate(_docs(["x"]))
        with pytest.raises(ValueError):
            strip_boilerplate(_docs(["x"]), min_docs=2, doc_frac=(1, 2))


class TestFunnelCounts:
    def _events(self, rows):
        # rows: (user, second, type)
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(
                        np.asarray([r[0] for r in rows], dtype=np.int64)
                    ),
                    "ts": pa.array(
                        [
                            pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=r[1])
                            for r in rows
                        ],
                        type=pa.timestamp("us"),
                    ),
                    "event_type": pa.array(
                        [r[2] for r in rows], type=pa.string()
                    ),
                }
            )
        )

    def test_order_matters(self):
        from raylink.ops.window import funnel_counts

        ev = self._events(
            [
                (1, 0, "view"), (1, 10, "click"), (1, 20, "buy"),   # full
                (2, 0, "click"), (2, 10, "view"),                   # click BEFORE view
                (3, 0, "view"),                                     # view only
                (4, 5, "view"), (4, 5, "click"),                    # tie: strict > fails
            ]
        )
        out = (
            funnel_counts(ev, ["view", "click", "buy"])
            .to_pandas()
            .sort_values("step_idx")
            .reset_index(drop=True)
        )
        assert out["step"].tolist() == ["view", "click", "buy"]
        # user2's click precedes their view; user4's click ties (strict >)
        assert out["n_users"].tolist() == [4, 1, 1]

    def test_conversion_uses_earliest_qualifying_time(self):
        from raylink.ops.window import funnel_counts

        # user1 clicks at t=5 (before view) and t=15 (after): qualifies
        # via the later click; then buys at t=10 -> before conversion
        # time 15, so step3 does NOT count them
        ev = self._events(
            [
                (1, 8, "view"), (1, 5, "click"), (1, 15, "click"),
                (1, 10, "buy"),
            ]
        )
        out = (
            funnel_counts(ev, ["view", "click", "buy"])
            .to_pandas()
            .sort_values("step_idx")["n_users"]
            .tolist()
        )
        assert out == [1, 1, 0]

    def test_ns_timestamps_accepted(self):
        from raylink.ops.window import funnel_counts

        tbl = pa.table(
            {
                "user_id": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([1_000_000_001, 2_000_000_002]).cast(
                    pa.timestamp("ns")
                ),
                "event_type": pa.array(["a", "b"], type=pa.string()),
            }
        )
        out = (
            funnel_counts(rd.from_arrow(tbl), ["a", "b"])
            .to_pandas()
            .sort_values("step_idx")["n_users"]
            .tolist()
        )
        assert out == [1, 1]


class TestColumnProfile:
    def test_counts_nulls_distinct(self):
        from raylink.ops.profile import column_profile

        tbl = pa.table(
            {
                "a": pa.array([1, 1, 2, None, 3], type=pa.int64()),
                "b": pa.array(["x", "x", "x", "x", None], type=pa.string()),
                "c": pa.array([0.5, -0.0, 0.0, None, float("nan")]),
            }
        )
        out = (
            column_profile(rd.from_arrow(tbl))
            .to_pandas()
            .set_index("col_name")
        )
        assert out.loc["a", "n_rows"] == 5
        assert out.loc["a", "n_null"] == 1
        assert out.loc["a", "n_distinct"] == 3
        assert out.loc["b", "n_distinct"] == 1
        assert out.loc["b", "n_null"] == 1
        # -0.0 merges with 0.0 (SQL DISTINCT semantics); NaN counts once
        assert out.loc["c", "n_distinct"] == 3
        assert out.loc["c", "n_null"] == 1

    def test_distinct_across_batches_not_double_counted(self):
        from raylink.ops.profile import column_profile

        # 4 blocks each containing the same 3 values: distinct must be 3
        parts = [
            pa.table({"v": pa.array([1, 2, 3], type=pa.int64())})
            for _ in range(4)
        ]
        ds = rd.from_arrow(parts[0])
        for p in parts[1:]:
            ds = ds.union(rd.from_arrow(p))
        out = column_profile(ds, ["v"]).to_pandas()
        assert out.loc[0, "n_distinct"] == 3
        assert out.loc[0, "n_rows"] == 12


class TestDedupLinesGlobal:
    def test_first_writer_wins_across_docs(self):
        from raylink.ops.lines import dedup_lines_global

        docs = _docs(["a\nb\nc", "b\nx\n\nc", "a\ny"])
        out = (
            dedup_lines_global(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["text_clean"].tolist() == ["a\nb\nc", "x\n", "y"]
        assert out["n_kept"].tolist() == [3, 2, 1]
        assert out["n_dropped"].tolist() == [0, 2, 1]

    def test_within_doc_repeat_keeps_first_position(self):
        from raylink.ops.lines import dedup_lines_global

        docs = _docs(["x\nx\nx"])
        out = dedup_lines_global(docs).to_pandas()
        assert out.loc[0, "text_clean"] == "x"
        assert out.loc[0, "n_dropped"] == 2

    def test_doc_with_all_lines_owned_elsewhere_survives_empty(self):
        from raylink.ops.lines import dedup_lines_global

        docs = _docs(["k", "k"])
        out = (
            dedup_lines_global(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == 2
        assert out["text_clean"].tolist() == ["k", ""]

    def test_id_contract_raises(self):
        from raylink.ops.lines import dedup_lines_global

        import ray.data as rd

        bad = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([-1], type=pa.int64()),
                    "text": pa.array(["x"], type=pa.string()),
                }
            )
        )
        with pytest.raises(Exception, match="non-negative|2\\^42"):
            dedup_lines_global(bad).to_pandas()


class TestGoldenRecords:
    def _fixture(self):
        recs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                    "lang": pa.array(
                        ["en", "en", "de", "en", "fr", "fr"], type=pa.string()
                    ),
                    "source": pa.array(
                        ["w", "c", "c", "c", "w", "w"], type=pa.string()
                    ),
                }
            )
        )
        edges = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([1, 2, 5], type=pa.int64()),
                    "id_b": pa.array([2, 3, 6], type=pa.int64()),
                }
            )
        )
        return recs, edges

    def test_modes_singletons_and_sizes(self):
        from raylink.cluster import golden_records

        recs, edges = self._fixture()
        out = (
            golden_records(recs, edges, "doc_id", ["lang", "source"])
            .to_pandas()
            .sort_values("entity_id")
            .reset_index(drop=True)
        )
        assert out["entity_id"].tolist() == [1, 4, 5]
        assert out["n_members"].tolist() == [3, 1, 2]
        assert out["lang"].tolist() == ["en", "en", "fr"]
        # cluster {1,2,3}: sources w,c,c -> mode c
        assert out["source"].tolist() == ["c", "c", "w"]

    def test_tie_breaks_to_smaller_value(self):
        from raylink.cluster import golden_records

        recs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "lang": pa.array(["zz", "aa"], type=pa.string()),
                }
            )
        )
        edges = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([1], type=pa.int64()),
                    "id_b": pa.array([2], type=pa.int64()),
                }
            )
        )
        out = golden_records(recs, edges, "doc_id", ["lang"]).to_pandas()
        assert out.loc[0, "lang"] == "aa"  # count tie 1:1 -> min value


class TestSemistructured:
    def test_json_extract_types_and_nulls(self):
        from raylink.ops.semistructured import json_extract

        tbl = pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "js": pa.array(
                    [
                        '{"a": 7, "b": "x", "c": 1.5, "d": true}',
                        '{"a": null}',
                        "not json",
                        None,
                        "{}",
                    ],
                    type=pa.string(),
                ),
            }
        )
        out = json_extract(
            rd.from_arrow(tbl),
            "js",
            {
                "a": ("a", "int64"),
                "b": ("b", "string"),
                "c": ("c", "float64"),
                "d": ("d", "bool"),
            },
            keep_cols=["id"],
        ).to_pandas().sort_values("id").reset_index(drop=True)
        assert out.loc[0, "a"] == 7
        assert out.loc[0, "b"] == "x"
        assert out.loc[0, "c"] == 1.5
        assert bool(out.loc[0, "d"]) is True
        # null key / malformed / null row / absent key -> typed nulls
        assert out["a"].isna().tolist() == [False, True, True, True, True]

    def test_json_extract_rejects_unknown_type(self):
        from raylink.ops.semistructured import json_extract

        with pytest.raises(ValueError, match="unsupported type"):
            json_extract(None, "js", {"a": ("a", "decimal")})

    def test_snapshot_diff_classifies(self):
        from raylink.ops.semistructured import snapshot_diff

        old = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "v": pa.array(["a", "b", "c", None], type=pa.string()),
                }
            )
        )
        new = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([2, 3, 4, 5], type=pa.int64()),
                    "v": pa.array(["b", "C", None, "e"], type=pa.string()),
                }
            )
        )
        out = (
            snapshot_diff(old, new, "id", ["v"])
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        # 1 removed; 2 equal (absent); 3 changed; 4 null==null (absent);
        # 5 added
        assert out["id"].tolist() == [1, 3, 5]
        assert out["change"].tolist() == ["removed", "changed", "added"]

    def test_snapshot_diff_duplicate_keys_raise(self):
        from raylink.ops.semistructured import snapshot_diff

        dup = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([1, 1], type=pa.int64()),
                    "v": pa.array(["a", "b"], type=pa.string()),
                }
            )
        )
        ok = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([1], type=pa.int64()),
                    "v": pa.array(["a"], type=pa.string()),
                }
            )
        )
        with pytest.raises(Exception, match="duplicate"):
            snapshot_diff(dup, ok, "id", ["v"]).to_pandas()


class TestIncrementalAggAndNormalize:
    def test_merge_sum_aggregates_equals_full(self):
        from raylink.ops.relational import merge_sum_aggregates

        prev = rd.from_arrow(
            pa.table(
                {
                    "g": pa.array(["a", "b"], type=pa.string()),
                    "s": pa.array([10, 20], type=pa.int64()),
                    "n": pa.array([2, 3], type=pa.int64()),
                }
            )
        )
        delta = rd.from_arrow(
            pa.table(
                {
                    "g": pa.array(["b", "c"], type=pa.string()),
                    "s": pa.array([5, 7], type=pa.int64()),
                    "n": pa.array([1, 1], type=pa.int64()),
                }
            )
        )
        out = (
            merge_sum_aggregates(prev, delta, ["g"], ["s", "n"],
                                 final_partitions=1)
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert out["g"].tolist() == ["a", "b", "c"]
        assert out["s"].tolist() == [10, 25, 7]
        assert out["n"].tolist() == [2, 4, 1]

    def test_normalize_text_whitespace_and_case(self):
        from raylink.ops.text import normalize_text

        docs = _docs(["  Hello\t\tWORLD \n x ", "a  b", ""])
        out = (
            normalize_text(docs)
            .to_pandas()
            .sort_values("doc_id")["text_norm"]
            .tolist()
        )
        assert out == ["hello world x", "a b", ""]


class TestGoldenNullField:
    def test_all_null_field_keeps_entity_with_null_golden(self):
        """An entity whose requested field is all-null within its component
        must still appear, with a null golden value (r4 ADVICE: the mode
        groupby drops NaN and an inner merge dropped the entity)."""
        from raylink.cluster import golden_records

        recs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "lang": pa.array([None, None, "fr"], type=pa.string()),
                    "source": pa.array(["w", "c", None], type=pa.string()),
                }
            )
        )
        edges = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([1], type=pa.int64()),
                    "id_b": pa.array([2], type=pa.int64()),
                }
            )
        )
        out = (
            golden_records(recs, edges, "doc_id", ["lang", "source"])
            .to_pandas()
            .sort_values("entity_id")
            .reset_index(drop=True)
        )
        # entity {1,2}: lang all-null -> null golden, source mode 'c'
        # entity {3}: singleton with null source
        assert out["entity_id"].tolist() == [1, 3]
        assert out["n_members"].tolist() == [2, 1]
        assert pd.isna(out.loc[0, "lang"]) and out.loc[0, "source"] == "c"
        assert out.loc[1, "lang"] == "fr" and pd.isna(out.loc[1, "source"])
