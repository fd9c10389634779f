"""Feature battery tests (F8-F19): unit parity + end-to-end tables."""

from __future__ import annotations

import numpy as np
import pytest

from widiff_spark import featurelib as FL
from widiff_spark import features


class TestTextBattery:
    def test_levenshtein(self):
        assert FL.levenshtein("kitten", "sitting") == 3
        assert FL.levenshtein("", "abc") == 3
        assert FL.levenshtein("abc", "abc") == 0

    def test_edit_operations(self):
        ins, dels, subs = FL.edit_operations("kitten", "sitting")
        assert ins + dels + subs == 3
        assert FL.edit_operations("abc", "abcd") == (1, 0, 0)
        assert FL.edit_operations("abcd", "abc") == (0, 1, 0)

    def test_adjacent_swap(self):
        assert FL.has_adjacent_swap("tent", "tetn") == 1
        assert FL.has_adjacent_swap("caro", "caor") == 1
        assert FL.has_adjacent_swap("abc", "abd") == 0
        assert FL.has_adjacent_swap("ab", "abc") == 0

    def test_text_features_full(self):
        # serialized values arrive quoted; battery strips quotes
        r = FL.text_features("text", '"old title"', '"new title"')
        (overlap, old_in_new, new_in_old, ratio, complete, length_diff,
         tok_old, tok_new, lev, same_wo, special_diff, ins, dels, subs,
         swap, pre, suf) = r
        assert overlap == pytest.approx(1 / 3)   # {title} / {old,new,title}
        assert (old_in_new, new_in_old, complete) == (0, 0, 0)
        assert lev == 3 and ratio == pytest.approx(3 / 9)  # old->new: 3 subs
        assert (tok_old, tok_new, length_diff) == (2, 2, 0)
        assert suf == 1 and pre == 0

    def test_entity_mode_returns_five(self):
        assert len(FL.text_features("entity", '"a"', '"b"')) == 5


class TestQuantityBattery:
    def test_sign_change(self):
        r = FL.quantity_features('"+5"', '"-5"')
        assert r[0] == 1          # sign_change
        assert r[7] == 0          # same_float_value

    def test_precision_change(self):
        r = FL.quantity_features('"+12"', '"+12.5"')
        assert r[1] == 1          # precision_change
        assert r[4] == 0          # whole_number_change

    def test_prefix_growth(self):
        r = FL.quantity_features('"+88"', '"+8848"')
        assert r[5] == 1 and r[2] == 1     # old_is_prefix + length_increase

    def test_same_float(self):
        r = FL.quantity_features('"+12.0"', '"+12.00"')
        assert r[7] == 1


class TestTimeBattery:
    def test_real_month_change(self):
        r = FL.time_features('"+1952-03-11T00:00:00Z"',
                             '"+1952-04-11T00:00:00Z"')
        (diff, sign, one_to_zero, d_add, d_rm, m_add, m_rm,
         y_chg, d_chg, m_chg) = r
        assert diff == 30 and m_chg == 1 and y_chg == 0 and d_chg == 0

    def test_placeholder_reformat(self):
        r = FL.time_features('"+2000-01-01T00:00:00Z"',
                             '"+2000-00-00T00:00:00Z"')
        assert r[2] == 1          # change_one_to_zero
        assert r[8] == 0 and r[9] == 0  # not a real day/month change

    def test_day_added(self):
        r = FL.time_features('"+2000-05-00T00:00:00Z"',
                             '"+2000-05-10T00:00:00Z"')
        assert r[3] == 1          # day_added

    def test_negative_years(self):
        r = FL.time_features('"-0500-01-01T00:00:00Z"',
                             '"+0500-01-01T00:00:00Z"')
        assert r[0] == int(1000 * 365.25)
        assert r[1] == 1          # sign-only change


class TestGlobeBattery:
    def test_lat_sign_change(self):
        old = '{"longitude": 13.39, "latitude": 52.51}'
        new = '{"longitude": 13.39, "latitude": -52.51}'
        r = FL.globe_features(old, new)
        assert r[0] == 1 and r[2] == 0    # lat sign change, same whole number
        assert r[15] == 1                  # longitude same float


class TestEmbeddingStub:
    def test_deterministic_unit_vectors(self):
        a = features.embed_texts(["hello", "hello", "world"])
        assert np.allclose(a[0], a[1])
        assert not np.allclose(a[0], a[2])
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


class TestFeatureTables:
    def test_text_features_row(self, result):
        ft = result["features_text"]
        row = ft[(ft.revision_id == 1101)].iloc[0]
        assert row.old_value == '"old title"' and row.new_value == '"new title"'
        assert row.levenshtein_distance == 3
        assert row.entity_label == "title page"
        assert bool(row.processed) is False

    def test_time_features_row(self, result):
        ft = result["features_time"]
        row = ft[ft.revision_id == 3601].iloc[0]
        assert row.date_diff_days == 30 and row.different_month == 1

    def test_quantity_features_from_hot_page(self, result):
        fq = result["features_quantity"]
        assert (fq.new_datatype == "quantity").all()
        assert (fq.action == "UPDATE").all()

    def test_globe_features_row(self, result):
        fg = result["features_globecoordinate"]
        row = fg[fg.revision_id == 3701].iloc[0]
        assert row.latitude_sign_change == 1
        assert row.longitude_same_float_value == 0  # 13.39 -> 13.3901

    def test_entity_placeholder_row(self, result):
        fe = result["features_entity"]
        row = fe[fe.revision_id == 3501].iloc[0]
        assert row.old_value == '"Q2"' and row.new_value == '"Q544"'
        assert row.old_value_label == "" and bool(row.processed) is False

    def test_update_rows_only_same_datatype(self, result):
        for t in ["features_text", "features_time", "features_quantity",
                  "features_globecoordinate", "features_entity"]:
            pdf = result[t]
            if len(pdf):
                assert (pdf.action == "UPDATE").all()
                assert (pdf.change_target == "").all()
                assert (pdf.old_datatype == pdf.new_datatype).all()


class TestBackfill:
    def test_entity_backfill(self, spark):
        from widiff_spark import fixtures
        from widiff_spark.pipeline import run_pipeline

        docs = fixtures.edge_case_corpus(spark, include_hot_page=False)
        res = run_pipeline(spark, docs)
        closures = {rel: fixtures.transitive_closure_df(spark, rel)
                    for rel in fixtures.TRANSITIVE_CLOSURES}
        filled = features.backfill_entity_features(
            res.tables["features_entity"],
            fixtures.entity_labels_df(spark), closures).toPandas()
        res.unpersist()
        row = filled[filled.revision_id == 3501].iloc[0]
        assert row.old_value_label == "Earth"          # label join
        assert bool(row.processed) is True
        # Q2 part_of Q544 is in the closure fixture -> forward flag set
        assert row.old_value_part_of_new_value == 1
        assert row.new_value_part_of_old_value == 0
        # labels differ, links differ -> not a pure link change
        assert row.is_link_change == 0
        assert -1.0 <= row.label_cosine_similarity <= 1.0

    def test_text_backfill(self, spark, tmp_path):
        from widiff_spark import fixtures
        from widiff_spark.pipeline import run_pipeline

        docs = fixtures.edge_case_corpus(spark, include_hot_page=False)
        res = run_pipeline(spark, docs)
        filled = features.backfill_text_features(
            res.tables["features_text"]).toPandas()
        res.unpersist()
        assert filled.processed.all()
        same = filled[filled.old_value == filled.new_value]
        assert (same.value_cosine_similarity == 1.0).all() if len(same) else True
