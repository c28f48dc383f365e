"""SplinkDataFrame result-handle parity (reference
internals/splink_dataframe.py:19-295): every Linker namespace method that
returns a DataFrame returns one that ALSO speaks the reference's accessor
API, while remaining a native Spark DataFrame."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame

import splink_spark.internals.comparison_library as cl
from splink_spark import Linker, SettingsCreator, SplinkDataFrame, block_on


@pytest.fixture(scope="module")
def linker(persons):
    name = cl.LevenshteinAtThresholds("first_name", [2])
    surname = cl.ExactMatch("surname")
    for comp, mus in (
        (name, {2: (0.7, 0.01), 1: (0.2, 0.05), 0: (0.1, 0.94)}),
        (surname, {1: (0.9, 0.02), 0: (0.1, 0.98)}),
    ):
        for lv in comp.comparison_levels:
            if not lv.is_null_level:
                m, u = mus[lv.comparison_vector_value]
                lv.m_probability = m
                lv.u_probability = u
    settings = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[name, surname],
        blocking_rules_to_generate_predictions=[block_on("surname")],
        probability_two_random_records_match=0.05,
    )
    return Linker(persons, settings)


def test_predict_returns_splink_dataframe_that_is_a_spark_dataframe(linker):
    df = linker.inference.predict()
    assert isinstance(df, SplinkDataFrame)
    assert isinstance(df, DataFrame)
    # native Spark ops still work on the same handle
    n = df.count()
    assert n > 0
    assert df.filter("match_probability >= 0").count() == n
    # reference identity attributes
    assert df.templated_name == "__splink__df_predict"
    assert df.physical_name.startswith("__splink__df_predict_")
    assert not df.physical_and_template_names_equal
    assert df.created_by_splink


def test_reference_accessors_match_native_collect(linker):
    df = linker.inference.predict()
    recs = df.as_record_list(5)
    assert len(recs) == 5 and isinstance(recs[0], dict)
    assert "match_probability" in recs[0]
    # pre-v5 alias
    assert df.as_record_dict(2) == df.as_record_list(2)
    pdf = df.as_pandas_dataframe(5)
    assert len(pdf) == 5
    tbl = df.as_pyarrow_table(5)
    assert tbl.num_rows == 5
    d = df.as_dict(3)
    assert set(d) == set(df.columns) and len(d["match_probability"]) == 3
    rel = df.as_duckdbpyrelation(5)
    assert rel.aggregate("count(*)").fetchone()[0] == 5
    plain = df.as_spark_dataframe()
    assert isinstance(plain, DataFrame) and not isinstance(plain, SplinkDataFrame)
    assert plain.count() == df.count()


def test_query_sql_references_physical_name(linker):
    df = linker.inference.predict()
    out = df.query_sql(
        f"select count(*) as n from {df.physical_name} "  # noqa: S608
        "where match_probability >= 0"
    )
    assert isinstance(out, SplinkDataFrame)
    assert out.as_record_list()[0]["n"] == df.count()
    assert out.sql_used_to_create.startswith("select count(*)")


def test_to_parquet_and_to_csv_overwrite_semantics(linker, tmp_path):
    df = linker.inference.predict()
    pq = str(tmp_path / "pred_parquet")
    df.to_parquet(pq)
    assert os.path.exists(pq)
    with pytest.raises(ValueError, match="already exists"):
        df.to_parquet(pq)
    df.to_parquet(pq, overwrite=True)
    spark = df.sparkSession
    assert spark.read.parquet(pq).count() == df.count()

    # transformations return plain Spark DataFrames (documented);
    # wrap_df re-types without copying
    from splink_spark.internals.splink_dataframe import wrap_df

    narrow = wrap_df(df.select("match_probability"), "__splink__narrow")
    csv = str(tmp_path / "pred_csv")
    narrow.to_csv(csv)
    with pytest.raises(ValueError, match="already exists"):
        narrow.to_csv(csv)


def test_drop_guard_and_cache_release(linker):
    df = linker.inference.predict()
    df.query_sql(f"select 1 as one from {df.physical_name} limit 1")
    df.drop_table_from_database_and_remove_from_cache()  # no raise: splink-made
    # views registered by query_sql are gone
    assert not any(
        v.name == df.physical_name for v in df.sparkSession.catalog.listTables()
    )
    df.created_by_splink = False
    with pytest.raises(ValueError, match="force_non_splink_table"):
        df.drop_table_from_database_and_remove_from_cache()
    df.drop_table_from_database_and_remove_from_cache(force_non_splink_table=True)


def test_all_namespaces_wrap_dataframe_returns(linker, persons):
    cases = [
        linker.inference.deterministic_link(),
        linker.clustering.cluster_pairwise_predictions_at_threshold(
            linker.inference.predict(), threshold_match_probability=0.9
        ),
        linker.table_management.compute_tf_table("surname"),
    ]
    for out in cases:
        assert isinstance(out, SplinkDataFrame), type(out)
    # non-DataFrame returns are untouched
    j = linker.misc.save_model_to_json()
    assert isinstance(j, (dict, str))


def test_templated_name_overrides(linker):
    det = linker.inference.deterministic_link()
    assert det.templated_name == "__splink__df_predict"
    tf = linker.table_management.compute_tf_table("surname")
    assert tf.templated_name == "__splink__df_tf"
