"""Reference-parity pipeline: the reference's full ETL + Q2-Q5 replayed on
its own embedded seed (sources/bookorders.py), for the golden-output suite.

Each function mirrors one reference query (cited), with the SURVEY.md §7.3
rewrites applied: D1 trimmed names, D2 dependent-column groupBy, D3 explicit
scalar cross joins, D5 row_number time ids.  Golden values live in
tests/test_reference_golden.py (from assignment-5.md's psql outputs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .etl.time_dim import build_time_dim
from .functions import dec
from .sources import bookorders


@dataclass
class RefWarehouse:
    """Seed tables + derived star schema, memoized per session."""

    spark: SparkSession
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def _seed(self) -> None:
        if "customer" in self._cache:
            return
        tables = bookorders.load_bookorders(self.spark)
        tables["customer"] = bookorders.clean_customer(tables["customer"])
        for name, df in tables.items():
            self._cache[name] = df.cache()

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        self._seed()
        if name in self._cache:
            return self._cache[name]
        raise AttributeError(name)

    # -- warehouse layer ---------------------------------------------------

    def time(self) -> DataFrame:
        """assignment-5.sql:42-61 (SERIAL timeid in orderdate order)."""
        if "time" not in self._cache:
            self._cache["time"] = build_time_dim(
                self.cust_order, date_col="orderdate"
            ).cache()
        return self._cache["time"]

    def sales(self) -> DataFrame:
        """assignment-5.sql:70-80: Amnt = SUM(quantity*price) per
        (customer, day, book) over the 5-way natural join."""
        if "sales" not in self._cache:
            od = self.order_detail.select("orderid", "isbn", "quantity")
            bk = self.book.select("isbn", "price")
            co = self.cust_order.select("orderid", "orderdate", "customerid")
            td = self.time().select("timeid", "orderdate")
            self._cache["sales"] = (
                od.join(F.broadcast(bk), "isbn")
                .join(F.broadcast(co), "orderid")
                .join(F.broadcast(td), "orderdate")
                .groupBy("customerid", "timeid", "isbn")
                .agg(F.sum(dec("quantity") * F.col("price")).alias("amnt"))
                .cache()
            )
        return self._cache["sales"]

    def sales_cust_time(self) -> DataFrame:
        """sales NATURAL JOIN customer NATURAL JOIN time (the Q5 spine)."""
        return (
            self.sales()
            .join(F.broadcast(self.customer), "customerid")
            .join(F.broadcast(self.time()), "timeid")
        )


# -- Q2: averages and re-aggregation (assignment-5.sql:128-175) -------------

def avg_amnt_view(wh: RefWarehouse) -> DataFrame:
    """Per-customer avg transaction (sql:128-133)."""
    return wh.sales().groupBy("customerid").agg(F.avg("amnt").alias("avg_amnt"))


def avg_of_avgs(wh: RefWarehouse) -> DataFrame:
    """The deliberately 'wrong' avg of per-customer avgs (sql:135)."""
    return avg_amnt_view(wh).agg(F.avg("avg_amnt").alias("avg_of_avgs"))


def avg_transaction(wh: RefWarehouse) -> DataFrame:
    """Accepted per-transaction avg (sql:139)."""
    return wh.sales().agg(F.avg("amnt").alias("avg_amnt"))


def sum_customer_per_day(wh: RefWarehouse) -> DataFrame:
    """(customer, day) spending tuples (sql:149-155)."""
    return (
        wh.sales()
        .groupBy("customerid", "timeid")
        .agg(F.sum("amnt").alias("amnt_spent_daily_by_customers"))
    )


def daily_avg_spending(wh: RefWarehouse) -> DataFrame:
    """Per-day customer count + avg spending (sql:165-170)."""
    return (
        sum_customer_per_day(wh)
        .groupBy("timeid")
        .agg(
            F.count(F.lit(1)).alias("number_of_customer_a_day"),
            F.avg("amnt_spent_daily_by_customers").alias("avg_spending"),
        )
    )


def weighted_avg(wh: RefWarehouse) -> DataFrame:
    """Weighted reconstruction sum(avg*cnt)/sum(cnt) (sql:172-175): must
    equal the direct customer-day average."""
    return daily_avg_spending(wh).agg(
        (
            F.sum(F.col("avg_spending") * F.col("number_of_customer_a_day"))
            / F.sum("number_of_customer_a_day")
        ).alias("total_avg")
    )


# -- Q3: best buyers and the order-percentage chain (sql:191-283) -----------

def best_buyers(wh: RefWarehouse) -> DataFrame:
    """Top-5 spenders with names (sql:191-200; D2 groupBy rewrite)."""
    return (
        wh.sales()
        .join(F.broadcast(wh.customer.select("customerid", "f_name", "l_name")), "customerid")
        .groupBy("customerid", "f_name", "l_name")
        .agg(F.sum("amnt").alias("spending"))
        .orderBy(F.col("spending").desc(), F.col("customerid").asc())
        .limit(5)
    )


def amount_per_order(wh: RefWarehouse) -> DataFrame:
    """Per-order amount over od x book (sql:213-218)."""
    return (
        wh.order_detail.join(F.broadcast(wh.book.select("isbn", "price")), "isbn")
        .groupBy("orderid")
        .agg(F.sum(dec("quantity") * F.col("price")).alias("order_amount"))
    )


def ord_avg_amnt(wh: RefWarehouse) -> DataFrame:
    """Scalar: avg order amount (sql:221-223)."""
    return amount_per_order(wh).agg(F.avg("order_amount").alias("ord_avg_amnt"))


def _best_buyer_id(wh: RefWarehouse) -> DataFrame:
    return best_buyers(wh).limit(1).select("customerid")


def no_of_ord(wh: RefWarehouse) -> DataFrame:
    """Scalar: number of orders of the best buyer (sql:232-235; B8 semi)."""
    return (
        wh.cust_order.join(F.broadcast(_best_buyer_id(wh)), "customerid", "left_semi")
        .agg(F.count(F.lit(1)).alias("no_of_ord"))
    )


def amount_per_order_by_customer(wh: RefWarehouse) -> DataFrame:
    """The best buyer's per-order amounts (sql:244-250)."""
    orders_of_best = wh.cust_order.join(
        F.broadcast(_best_buyer_id(wh)), "customerid", "left_semi"
    ).select("orderid")
    return amount_per_order(wh).join(F.broadcast(orders_of_best), "orderid", "left_semi")


def perc_of_ord(wh: RefWarehouse) -> DataFrame:
    """Percentage of the best buyer's orders above the global order average
    (sql:259-263): scalar cross join of three 1-row relations (D3)."""
    above = (
        amount_per_order_by_customer(wh)
        .crossJoin(F.broadcast(ord_avg_amnt(wh)))
        .filter(F.col("order_amount") > F.col("ord_avg_amnt"))
        .agg(F.count(F.lit(1)).alias("n_above"))
    )
    return (
        above.crossJoin(F.broadcast(no_of_ord(wh)))
        .select(
            (F.col("n_above").cast("decimal(18,10)") * 100 / F.col("no_of_ord"))
            .alias("perc_of_ord")
        )
    )


def classification(wh: RefWarehouse) -> DataFrame:
    """4-band CASE over perc_of_ord (sql:271-283)."""
    p = F.col("perc_of_ord")
    return perc_of_ord(wh).select(
        F.when(p >= 75, F.lit("most of the orders are above the average amount"))
        .when((p < 75) & (p >= 50), F.lit("greater (than average) to medium number of orders are above the average amount"))
        .when((p < 50) & (p >= 25), F.lit("medium to small number of orders are above the average amount"))
        .otherwise(F.lit("small number of orders are above the average amount"))
        .alias("order_classification")
    )


# -- Q4 views (sql:300-321, 401-409) ----------------------------------------

def view1(wh: RefWarehouse) -> DataFrame:
    """Fact + customer/time attributes at full grain (sql:300-310)."""
    cust = wh.customer.select("customerid", "f_name", "l_name", "district")
    td = wh.time().select("timeid", "dayofweek")
    return (
        wh.sales()
        .join(F.broadcast(cust), "customerid")
        .join(F.broadcast(td), "timeid")
        .select("customerid", "f_name", "l_name", "district", "timeid", "dayofweek", "isbn", "amnt")
    )


def view2(wh: RefWarehouse) -> DataFrame:
    """Per-(customer, year) sums (sql:313-321)."""
    td = wh.time().select("timeid", "year")
    cust = wh.customer.select("customerid", "f_name", "l_name")
    return (
        wh.sales()
        .join(F.broadcast(td), "timeid")
        .join(F.broadcast(cust), "customerid")
        .groupBy("customerid", "f_name", "l_name", "year")
        .agg(F.sum("amnt").alias("sum"))
    )


def view3(wh: RefWarehouse) -> DataFrame:
    """Per-(district, day, book) sums (sql:401-409)."""
    cust = wh.customer.select("customerid", "district")
    td = wh.time().select("timeid", "dayofweek")
    return (
        wh.sales()
        .join(F.broadcast(cust), "customerid")
        .join(F.broadcast(td), "timeid")
        .groupBy("district", "timeid", "dayofweek", "isbn")
        .agg(F.sum("amnt").alias("sum"))
    )


def top_country_raw(wh: RefWarehouse) -> DataFrame:
    """Q4b: country with the biggest spending, from base tables (sql:415-428)."""
    return (
        wh.sales()
        .join(F.broadcast(wh.customer.select("customerid", "country")), "customerid")
        .groupBy("country")
        .agg(F.sum("amnt").alias("spending"))
        .orderBy(F.col("spending").desc(), F.col("country").asc())
        .limit(1)
    )


def top_country_view3(wh: RefWarehouse) -> DataFrame:
    """Q4b from View3 via the district->country FD bridge (sql:461-469)."""
    bridge = wh.customer.select("district", "country").distinct()
    return (
        view3(wh)
        .join(F.broadcast(bridge), "district")
        .groupBy("country")
        .agg(F.sum("sum").alias("spending"))
        .orderBy(F.col("spending").desc(), F.col("country").asc())
        .limit(1)
    )


# -- Q5 windows (sql:490-614) -----------------------------------------------

def _apr_may_2017(wh: RefWarehouse) -> DataFrame:
    return wh.sales_cust_time().filter(
        F.col("month").isin("April", "May") & (F.col("year") == 2017)
    )


def q5a_customer_sums(wh: RefWarehouse) -> DataFrame:
    """Per-customer sums in Apr-May 2017 (sql:490-497)."""
    return (
        _apr_may_2017(wh)
        .groupBy("customerid", "f_name")
        .agg(F.sum("amnt").alias("sumofsalesbycustomer"))
    )


def q5a_city_avgs(wh: RefWarehouse) -> DataFrame:
    """Per-city transaction avgs (sql:503-509)."""
    return _apr_may_2017(wh).groupBy("city").agg(F.avg("amnt").alias("avgofsalesbycity"))


def q5a_window_report(wh: RefWarehouse) -> DataFrame:
    """Two named windows in one select + DISTINCT (sql:514-527)."""
    cust_win = Window.partitionBy("customerid")
    city_win = Window.partitionBy("city")
    return (
        _apr_may_2017(wh)
        .select(
            "customerid",
            "f_name",
            "city",
            F.sum("amnt").over(cust_win).alias("sumofsalesbycustomer"),
            F.avg("amnt").over(city_win).alias("avgofsalesbycity"),
        )
        .distinct()
    )


def customer_spending(wh: RefWarehouse) -> DataFrame:
    """Per-customer period spending MV (sql:534-543)."""
    return (
        _apr_may_2017(wh)
        .groupBy("customerid", "f_name", "city")
        .agg(F.sum("amnt").alias("amountofspending"))
    )


def sum_per_day_per_city(wh: RefWarehouse) -> DataFrame:
    """Per-(city, day) sums MV (sql:567-576)."""
    return (
        _apr_may_2017(wh)
        .groupBy("city", "timeid", F.col("orderdate").alias("day"))
        .agg(F.sum("amnt").alias("sumspending"))
    )


def q5b_cumulative_from_mv(wh: RefWarehouse) -> DataFrame:
    """Running per-city sum over the MV (sql:581-588)."""
    win = Window.partitionBy("city").orderBy("timeid")
    return sum_per_day_per_city(wh).select(
        "city",
        "timeid",
        "day",
        F.col("sumspending").alias("sum_amnt"),
        F.sum("sumspending").over(win).alias("cumulative_sum"),
    )


def q5b_cumulative_nested(wh: RefWarehouse) -> DataFrame:
    """Same report as one nested-window query (sql:597-614): per-(city,day)
    window sum -> DISTINCT -> per-city running sum."""
    win_date = Window.partitionBy("city", "timeid")
    inner = (
        _apr_may_2017(wh)
        .select(
            "city",
            "timeid",
            "orderdate",
            F.sum("amnt").over(win_date).alias("sumspending"),
        )
        .distinct()
    )
    win_city = Window.partitionBy("city").orderBy("timeid")
    return inner.select(
        "city",
        "timeid",
        F.col("orderdate").alias("day"),
        F.col("sumspending").alias("sum_amnt"),
        F.sum("sumspending").over(win_city).alias("cumulative_sum"),
    )


def q5a_period_avg_by_city(wh: RefWarehouse) -> DataFrame:
    """The second Q5a report (sql:545-557): per-city average of each
    customer's PERIOD spending, windowed over the customer_spending grain."""
    city_win = Window.partitionBy("city")
    return customer_spending(wh).select(
        "customerid",
        "f_name",
        "city",
        "amountofspending",
        F.avg("amountofspending").over(city_win).alias("avgspendingbycity"),
    )
