"""Raster-SQL parser tests + SQL-driven e2e parity vs the numpy oracle."""

import pytest

from gfw_raster_analysis_lambda_spark import oracle
from gfw_raster_analysis_lambda_spark.api import zonal_statistics
from gfw_raster_analysis_lambda_spark.plans.ir import FilterAnd, FilterLeaf, FilterOr
from gfw_raster_analysis_lambda_spark.plans.sql_frontend import (
    QueryParseError,
    parse_raster_sql,
)
from gfw_raster_analysis_lambda_spark.sources import fixtures
from gfw_raster_analysis_lambda_spark.sources.images import read_images

from test_zonal_e2e import assert_frames_match


@pytest.fixture(scope="module")
def env():
    return fixtures.fixture_environment()


def test_parse_flagship(env):
    q = parse_raster_sql(
        "SELECT tcl_year, SUM(area__ha) AS loss_ha, SUM(emissions_Mg) AS em "
        "FROM tcl_year WHERE is_primary = 'true' AND tcd_threshold >= 30 "
        "GROUP BY tcl_year ORDER BY tcl_year LIMIT 50",
        env,
    )
    assert q.base_layer == "tcl_year"
    assert q.group_layers == ("tcl_year",)
    assert [a.alias for a in q.aggregates] == ["loss_ha", "em"]
    assert q.limit == 50
    # literal encoding happened at parse time (meaning -> raw pixel space)
    leaves = q.where.children
    assert leaves[0] == FilterLeaf("is_primary", "in", (1,))
    assert leaves[1] == FilterLeaf("tcd_threshold", "in", (5, 6, 7))


def test_parse_group_ordinal_and_isoweek(env):
    q = parse_raster_sql(
        "SELECT isoweek(alert_date), COUNT(*) AS n FROM alert_date_conf GROUP BY 1",
        env,
    )
    assert q.group_layers == ("alert_date",)
    assert q.isoweek_layers == ("alert_date",)


def test_parse_nested_filters(env):
    q = parse_raster_sql(
        "SELECT COUNT(*) AS n FROM data WHERE "
        "(tcl_year > 5 AND tcl_year < 15) OR (is_primary = 'true' AND tcd_threshold IN (30, 75))",
        env,
    )
    assert isinstance(q.where, FilterOr)
    left, right = q.where.children
    assert isinstance(left, FilterAnd) and isinstance(right, FilterAnd)
    assert right.children[1] == FilterLeaf("tcd_threshold", "in", (5, 7))


def test_parse_between_and_date_encoding(env):
    q = parse_raster_sql(
        "SELECT COUNT(*) AS n FROM alert_date_conf "
        "WHERE alert_date BETWEEN '2015-07-20' AND '2015-12-31'",
        env,
    )
    lo, hi = q.where.children
    assert lo.values[0] == 200  # 2015-07-20 is day 200 of the packing epoch
    assert hi.op == "<=" and hi.values[0] == 364


def test_parse_errors(env):
    with pytest.raises(QueryParseError):
        parse_raster_sql("SELECT no_such_layer FROM data", env)
    with pytest.raises(QueryParseError):
        parse_raster_sql("SELECT SUM(area__ha) FROM not_a_layer", env)
    with pytest.raises(QueryParseError):
        parse_raster_sql("SELECT tcl_year FROM tcl_year GROUP BY", env)
    with pytest.raises(QueryParseError):
        parse_raster_sql("SELECT tcl_year, SUM(area__ha) AS a FROM tcl_year", env)
    with pytest.raises(QueryParseError):
        parse_raster_sql("DROP TABLE images", env)
    # malformed percentile fraction: frontend contract, not a bare ValueError
    with pytest.raises(QueryParseError, match="not a number"):
        parse_raster_sql("SELECT PERCENTILE(emissions, abc) FROM data", env)


def test_sql_e2e_vs_oracle(spark, corpus, env):
    images = read_images(spark, corpus["images"])
    aoi = spark.read.parquet(corpus["aoi"])
    sql = (
        "SELECT tcl_year, SUM(area__ha) AS loss_ha FROM tcl_year "
        "WHERE is_primary = 'true' AND (tcd_threshold >= 30 OR drivers = 'Fire') "
        "GROUP BY tcl_year ORDER BY loss_ha DESC, tcl_year LIMIT 10"
    )
    got = zonal_statistics(spark, images, aoi, sql, env, fixtures.GRID.name).toPandas()
    q = parse_raster_sql(sql, env)
    exp = oracle.run_oracle(q, env, fixtures.fixture_aois())
    assert_frames_match(got, exp, sort_cols=["aoi_id", "loss_ha", "tcl_year"])


def test_sql_e2e_isoweek(spark, corpus, env):
    images = read_images(spark, corpus["images"])
    aoi = spark.read.parquet(corpus["aoi"]).filter("aoi_id = 'aoi_box_offset'")
    sql = (
        "SELECT isoweek(alert_date), COUNT(*) AS alert_count FROM alert_date_conf "
        "WHERE alert_conf = 3 GROUP BY 1"
    )
    got = zonal_statistics(spark, images, aoi, sql, env, fixtures.GRID.name).toPandas()
    q = parse_raster_sql(sql, env)
    exp = oracle.run_oracle(
        q, env, [a for a in fixtures.fixture_aois() if a[0] == "aoi_box_offset"]
    )
    assert_frames_match(got, exp)


def test_percentile_parse_and_validation():
    from gfw_raster_analysis_lambda_spark.plans.sql_frontend import (
        QueryParseError,
        parse_raster_sql,
    )
    from gfw_raster_analysis_lambda_spark.sources import fixtures

    env = fixtures.fixture_environment()
    q = parse_raster_sql(
        "SELECT percentile(ttc_percent, 0.75) AS p75 FROM ttc_percent", env
    )
    a = q.aggregates[0]
    assert (a.func, a.layer, a.alias, a.param) == ("percentile", "ttc_percent", "p75", 0.75)
    m = parse_raster_sql("SELECT median(emissions) FROM tcl_year", env)
    assert m.aggregates[0].param == 0.5
    with pytest.raises(QueryParseError):
        parse_raster_sql("SELECT percentile(ttc_percent, 1.5) FROM ttc_percent", env)


def test_mode_and_count_distinct_parse():
    from gfw_raster_analysis_lambda_spark.plans.sql_frontend import (
        QueryParseError,
        parse_raster_sql,
    )
    from gfw_raster_analysis_lambda_spark.sources import fixtures

    env = fixtures.fixture_environment()
    q = parse_raster_sql(
        "SELECT tcl_year, MODE(drivers) AS major FROM tcl_year GROUP BY tcl_year", env
    )
    a = [x for x in q.aggregates][0]
    assert (a.func, a.layer, a.alias) == ("mode", "drivers", "major")
    q2 = parse_raster_sql(
        "SELECT COUNT(DISTINCT alert_date) FROM alert_date_conf", env
    )
    a2 = q2.aggregates[0]
    assert (a2.func, a2.layer) == ("count_distinct", "alert_date")
    assert a2.alias == "count_distinct_alert_date"
    # plain COUNT still parses as before (argument ignored)
    q3 = parse_raster_sql("SELECT COUNT(*) AS n FROM tcl_year", env)
    assert q3.aggregates[0].func == "count"
    with pytest.raises(QueryParseError):
        parse_raster_sql("SELECT MODE(nope) FROM tcl_year", env)
    with pytest.raises(QueryParseError):
        parse_raster_sql("SELECT COUNT(DISTINCT nope) FROM tcl_year", env)
