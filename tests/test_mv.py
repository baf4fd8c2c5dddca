"""MV registry + aggregate-navigator tests: build the stack, check refresh
and drop, and verify the navigator reproduces the reference's rewrite
decisions (best buyers <- View2; top country <- View2/View3 via FD bridges)
with answers identical to base-table computation."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark.mv.definitions import (
    default_navigator,
    default_registry,
)
from postgresql_datawarehouse_excercise_spark.mv.navigator import AggQuery
from postgresql_datawarehouse_excercise_spark.queries import load_all

REGISTRY_NAMES = {
    "time", "sales", "avg_amnt_view", "sum_customer_per_day",
    "avg_spending_by_customer_on_each_day", "best_buyers", "amount_per_order",
    "ord_avg_amnt", "no_of_ord", "amount_per_order_by_customer", "perc_of_ord",
    "view1", "view2", "view3", "customer_spending", "sum_per_day_per_city",
}


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="pdwx-wh-")
    reg = default_registry(tmp)
    reg.build_all(spark, sf_dir)
    yield reg
    reg.drop_all()


def test_registry_covers_reference_mvs(built):
    assert set(built.defs) == REGISTRY_NAMES


def test_all_mvs_built_with_stats(built):
    for name in built.defs:
        assert built.is_built(name), name
        assert built.stats[name] >= 0


def test_view_stack_row_monotonicity(built):
    # view3 aggregates view1; view2 aggregates sales: coarser grain => fewer rows
    assert built.stats["view3"] <= built.stats["view1"]
    assert built.stats["view2"] <= built.stats["sales"]
    assert built.stats["sales"] <= built.stats["view1"]


def test_navigator_picks_view2_for_best_buyers(built):
    nav = default_navigator(built)
    q = AggQuery(group_cols=frozenset({"customerid", "name"}), measure="amnt")
    cand = nav.choose(q)
    assert cand is not None and cand.mv_name == "view2"


def test_navigator_top_country_uses_fd_bridge(built):
    nav = default_navigator(built)
    q = AggQuery(group_cols=frozenset({"country"}), measure="amnt")
    cands = nav.eligible(q)
    names = [c.mv_name for c in cands]
    # every additive view can answer via FDs; cheapest must be a real view,
    # not the fact table
    assert set(names) >= {"sales", "view1", "view2", "view3"}
    assert cands[0].mv_name in {"view2", "view3"}
    assert cands[0].via_fd == frozenset({"country"})


def test_navigator_answer_matches_base_tables(built, spark, sf_dir):
    nav = default_navigator(built)
    q = AggQuery(group_cols=frozenset({"country"}), measure="amnt")
    explain: list[str] = []
    got = nav.answer(spark, sf_dir, q, explain=explain).collect()
    want = (
        load_all()["q4b_top_country_raw"].fn(spark, sf_dir).collect()
    )
    got_map = {r["country"]: float(r["amnt"]) for r in got}
    top = max(got_map.items(), key=lambda kv: kv[1])
    assert top[0] == want[0]["country"]
    assert abs(top[1] - want[0]["spending"]) < 1e-2
    assert any("FD bridge" in e for e in explain)


def test_refresh_rebuilds_downstream(built, spark, sf_dir):
    before = dict(built.stats)
    built.refresh(spark, sf_dir, "sales")
    # sales and everything depending on it rebuilt with same contents
    assert built.stats["sales"] == before["sales"]
    assert built.stats["view2"] == before["view2"]


def test_uniqueness_invariant_on_sales_key(built, spark):
    # A7: unique index analog -- ETL assertion on the 3-col key
    sales = built.read(spark, "sales")
    dups = (
        sales.groupBy("customerid", "timeid", "partkey")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0
