"""Pin ``get_columns_used_from_sql`` to the reference's literal test matrix.

Reference: tests/test_columns_used.py (all six assertions) over
splink/internals/parse_sql.py's sqlglot walk — reproduced here without
sqlglot.
"""

from splink_spark.internals.parse_sql import get_columns_used_from_sql


def test_get_columns_used_reference_matrix():
    sql = """
    jaro_winkler_sim(mytable.surname_l, surname_r) > 0.99 or
    substr(mytable.surname_l || initial_l ,1,2) = substr(surname_r || initial_r,1,2)
    """
    assert set(get_columns_used_from_sql(sql)) == {
        "surname_l", "surname_r", "initial_l", "initial_r",
    }
    assert set(get_columns_used_from_sql(sql, retain_table_prefix=True)) == {
        "mytable.surname_l", "surname_r", "initial_l", "initial_r",
    }

    sql = " lat_lng_uncommon_l['lat'] - lat_lng_uncommon_r['lat'] "
    assert set(get_columns_used_from_sql(sql)) == {
        "lat_lng_uncommon_l", "lat_lng_uncommon_r",
    }

    sql = """
    transform(latlongexplode(lat_lng_arr_uncommon_l,lat_lng_arr_uncommon_r ),
    x -> sin(radians(x['place2']['lat'] - x['place1']['lat'])) )
    """
    assert set(get_columns_used_from_sql(sql)) == {
        "lat_lng_arr_uncommon_l", "lat_lng_arr_uncommon_r",
    }

    assert set(
        get_columns_used_from_sql("AGGREGATE(cities, 0, (x, y) -> x + length(y))")
    ) == {"cities"}

    assert set(
        get_columns_used_from_sql("AGGREGATE(cities, 0, x ->  length(x['a']))")
    ) == {"cities"}

    sql = """
    ARRAY_MIN(TRANSFORM(LATLONGEXPLODE(lat_lng_arr_uncommon_l, lat_lng_arr_uncommon_r),
    (x) -> (CAST(ATAN2(SQRT((POW(SIN(RADIANS(x['place2']['lat'] - x['place1']['lat']))
    / 2, 2) + COS(RADIANS(x['place1']['lat'])) * COS(RADIANS(x['place2']['lat']))
    * POW(SIN(RADIANS(x['place2']['long'] - x['place1']['long']) / 2), 2))),
    SQRT(-1 * (POW(SIN(RADIANS(x['place2']['lat'] - x['place1']['lat'])) / 2, 2) +
    COS(RADIANS(x['place1']['lat'])) * COS(RADIANS(x['place2']['lat'])) *
    POW(SIN(RADIANS(x['place2']['long'] - x['place1']['long']) / 2), 2)) + 1))
    * 12742 AS FLOAT)))) < 5
    """
    assert set(get_columns_used_from_sql(sql)) == {
        "lat_lng_arr_uncommon_l", "lat_lng_arr_uncommon_r",
    }


def test_columns_used_extra_cases():
    g = get_columns_used_from_sql
    # cast targets and aliases are not columns
    assert set(g("CAST(dob_l AS date) = CAST(dob_r AS date)")) == {"dob_l", "dob_r"}
    assert set(g("dob_l::date = dob_r::date")) == {"dob_l", "dob_r"}
    # string literals never contribute, even when they look like identifiers
    assert set(g("name_l = 'surname_r' AND name_r IS NOT NULL")) == {
        "name_l", "name_r",
    }
    # case expressions
    assert set(
        g("CASE WHEN city_l = city_r THEN 1 ELSE 0 END")
    ) == {"city_l", "city_r"}
    # l./r. prefixes behave like any table prefix
    assert set(g("l.first_name = r.first_name")) == {"first_name"}
    assert set(g("l.first_name = r.first_name", retain_table_prefix=True)) == {
        "l.first_name", "r.first_name",
    }
