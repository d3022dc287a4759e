"""Finance transforms — Spark re-expression of the reference dataflow.

Semantics parity with reference ``src/finance_etl/transform.py``
(cited per function); architecture is lazy DataFrame composition, so
Catalyst prunes/pushes everything and the whole fact build is one
shuffle-free union of narrow projections plus one broadcast join.

Money rounding uses ``pandas_round2`` = rint(x*100)/100 — the EXACT
floating-point operation sequence NumPy ``around(x, 2)`` performs
(multiply, rint half-even, divide), which is what pandas ``.round(2)``
does in the reference.  ``bround`` is NOT equivalent: it re-parses the
double's shortest decimal repr into BigDecimal, so e.g. 2.675 rounds
to 2.68 under bround but 2.67 under NumPy (2.675*100 = 267.49999…).
Bit-level parity here is what lets the seed-42 fixture reproduce the
reference's committed goldens (tests/test_reference_golden.py).
(The oracle-checked testdata queries use ``fround`` instead; the
finance path optimizes for reference parity, not DuckDB parity.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from finance_etl_pipeline_spark.functions.money import MONEY

# FX quotes need more scale than money amounts (a TZS→USD rate is
# ~0.0004); decimal mode carries them at scale 10
RATE_DECIMAL = DecimalType(20, 10)

MONEY_MODES = ("double", "decimal")


def pandas_round2(c):
    """NumPy-exact round to cents: rint(x*100)/100 (see module doc)."""
    return F.rint(c * 100) / 100


def round2_fn(money_mode: str):
    """The cents-rounding strategy for already-exact money inputs:

    - ``double``  — ``pandas_round2`` (bit-parity with the reference's
      pandas ``.round(2)``; half-even on the BINARY value).
    - ``decimal`` — ``bround`` (half-even on the EXACT value), typed
      DecimalType(18, 4).

    Only used where the operand is either exact (sums of fixed cents)
    or double-rounded upstream — per-row cent FIXING always runs
    ``pandas_round2`` in both modes, see ``to_fact_transactions``."""
    if money_mode == "decimal":
        return lambda c: F.bround(c, 2).cast(MONEY)
    return pandas_round2


class MissingFxRatesError(ValueError):
    """Raised when a non-base currency has no FX rate for its date
    (reference transform.py:40-42 — a hard error, deliberately NOT an
    as-of fill: silent rate substitution corrupts the books)."""


def build_dim_accounts(chart_of_accounts: DataFrame) -> DataFrame:
    """Account codes are strings, never ints — leading-zero safety
    (reference transform.py:6-9)."""
    return chart_of_accounts.withColumn(
        "account_code", F.col("account_code").cast("string")
    )


def fx_to_base(fx_rates: DataFrame, base_currency: str) -> DataFrame:
    """Day-grain FX table restricted to quotes into the base currency
    (reference transform.py:12-16)."""
    return fx_rates.filter(F.col("to_currency") == base_currency).select(
        F.to_date("date").alias("fx_date"),
        "from_currency",
        F.col("rate").alias("rate_fx"),
    )


def add_fx_amount_base(
    df: DataFrame, fx: DataFrame, base_currency: str
) -> DataFrame:
    """FX enrichment (reference transform.py:19-46):

    - broadcast left join on (day, currency) — the FX table is tiny
      (currencies × days), so the fact side never shuffles;
    - base-currency rows keep rate 1.0 even if an FX row exists
      (reference :23-25,37 — the join result is ignored for them);
    - any non-base row without a rate is a hard error listing the
      distinct missing (date, currency) pairs (reference :40-42);
    - amount_base = HALF_EVEN round(amount * rate, 2) (reference :44).
    """
    joined = df.join(
        F.broadcast(fx),
        (F.to_date(df["date"]) == fx["fx_date"])
        & (df["currency"] == fx["from_currency"]),
        "left",
    )
    rate = F.when(F.col("currency") == base_currency, F.lit(1.0)).otherwise(
        F.col("rate_fx")
    )
    out = joined.withColumn("rate", rate).drop("fx_date", "from_currency", "rate_fx")

    missing = (
        out.filter(F.col("rate").isNull())
        .select(F.to_date("date").alias("date"), "currency")
        .distinct()
    )
    missing_rows = missing.limit(20).collect()
    if missing_rows:
        pairs = ", ".join(f"({r.date}, {r.currency})" for r in missing_rows)
        raise MissingFxRatesError(f"Missing FX rates for: {pairs}")

    return out.withColumn(
        "amount_base", pandas_round2(F.col("amount") * F.col("rate"))
    )


def _project(df: DataFrame, source: str, document_id, amount, extra=None) -> DataFrame:
    """Align a raw source to the canonical 8-column pre-fact shape
    (reference transform.py:60,65,75,86)."""
    cols = {
        "date": F.col("date"),
        "entity": F.col("entity"),
        "source": F.lit(source),
        "document_id": document_id,
        "account_code": F.col("account_code").cast("string"),
        "currency": F.col("currency").cast("string"),
        "amount": amount,
        "description": F.col("description"),
    }
    if extra:
        cols.update(extra)
    return df.select(*[v.alias(k) for k, v in cols.items()])


def to_fact_transactions(
    sales: DataFrame,
    expenses: DataFrame,
    payroll: DataFrame,
    inventory: DataFrame,
    fx: DataFrame,
    base_currency: str,
    money_mode: str = "double",
) -> DataFrame:
    """Union of the four source projections + FX enrichment + txn_id
    (reference transform.py:49-110). Sign conventions are applied
    BEFORE any aggregation: expenses/payroll negative, inventory
    issues negative (reference :66,73,84).

    ``money_mode='decimal'`` (SURVEY §7.6.9): the per-row cent-fixing
    arithmetic (qty×cost, amount×rate, rint-round) stays bit-identical
    to the reference's pandas path in BOTH modes — a single double
    multiply has half-ulp error that never reaches a cent except at
    exact rounding ties, and matching the reference's tie behavior is
    the parity contract.  Decimal begins where scale risk begins:
    the OUTPUT money columns are cast to exact DecimalType, so every
    downstream sum/pivot/rollup (the place a 100 TB job adds ~10^9
    values per group and double error reaches real cents) is exact
    integer arithmetic.  This also makes decimal mode cent-identical
    to the golden-verified double mode by construction."""
    s = _project(sales, "sales", F.col("invoice_id"), F.col("amount"))
    e = _project(expenses, "expenses", F.col("bill_id"), -F.col("amount"))

    p = payroll.withColumns(
        {
            "date": F.last_day(F.to_date(F.concat(F.col("month"), F.lit("-01")))).cast(
                "timestamp"
            ),
            "account_code": F.lit("61000001"),
            "description": F.lit("Payroll net"),
        }
    )
    p = _project(
        p,
        "payroll",
        F.concat_ws("_", F.col("employee_id"), F.col("month")),
        -F.col("net"),
    )

    inv = inventory.withColumns(
        {
            "account_code": F.when(F.col("movement_type") == "issue", "50000001")
            .when(F.col("movement_type") == "receipt", "10000001")
            .when(F.col("movement_type") == "adjustment", "10000001"),
            "description": F.concat_ws(" ", F.col("movement_type"), F.col("sku")),
        }
    )
    inv_amount = pandas_round2(F.col("qty") * F.col("unit_cost"))
    inv = _project(
        inv,
        "inventory",
        F.concat_ws("_", F.col("sku"), F.to_date("date").cast("string")),
        F.when(F.col("movement_type") == "issue", -inv_amount).otherwise(inv_amount),
    )

    fact = s.unionByName(e).unionByName(p).unionByName(inv)
    fact = add_fx_amount_base(fact, fx, base_currency)

    fact = fact.withColumn(
        "txn_id", F.concat_ws("|", "entity", "source", "document_id")
    )
    if money_mode == "decimal":
        # the money boundary: cents are fixed above (double, reference
        # bit-parity); from here every money column is exact decimal
        fact = fact.withColumns(
            {
                "amount": F.col("amount").cast(MONEY),
                "amount_base": F.col("amount_base").cast(MONEY),
                "rate": F.col("rate").cast(RATE_DECIMAL),
            }
        )
    # Sort is a file-presentation guarantee (reference transform.py:94)
    # — downstream consumers must not rely on row order at scale.
    return fact.select(
        "txn_id",
        "date",
        "entity",
        "source",
        "document_id",
        "account_code",
        "currency",
        "amount",
        "rate",
        "amount_base",
        "description",
    ).orderBy("date", "entity", "source", "document_id")


KPI_ACCOUNT_TYPES = ["Asset", "COGS", "Expense", "Liability", "Revenue"]


def kpi_monthly(
    fact: DataFrame, dim_accounts: DataFrame, money_mode: str = "double"
) -> DataFrame:
    """Monthly KPI pivot (reference transform.py:113-128):
    broadcast account-type join → yyyy-MM derive → group-sum → pivot
    with EXPLICIT values (deterministic plan, no extra distinct job) →
    profits. COGS/Expense are stored negative, so gross_profit =
    Revenue + COGS and operating_profit = gross_profit + Expense.
    In decimal mode the pivot sums are exact decimal arithmetic and
    the profit columns stay DecimalType — the 100 TB-correct rollup."""
    round2 = round2_fn(money_mode)
    df = fact.join(
        F.broadcast(dim_accounts.select("account_code", "account_type")),
        "account_code",
        "left",
    ).withColumn("month", F.date_format("date", "yyyy-MM"))

    # explicit pivot values guarantee Revenue/COGS/Expense columns
    # always exist (no reference-style backfill loop needed); the
    # missing-cell fill is a typed coalesce so it works identically
    # for double and decimal pivot sums
    wide = df.groupBy("entity", "month").pivot(
        "account_type", KPI_ACCOUNT_TYPES
    ).sum("amount_base")
    wide = wide.withColumns(
        {
            c: F.coalesce(F.col(c), F.lit(0).cast(wide.schema[c].dataType))
            for c in KPI_ACCOUNT_TYPES
        }
    )
    return (
        wide.withColumn("gross_profit", round2(F.col("Revenue") + F.col("COGS")))
        .withColumn(
            "operating_profit", round2(F.col("gross_profit") + F.col("Expense"))
        )
        .orderBy("entity", "month")
    )


def kpi_cube(
    fact: DataFrame, dim_accounts: DataFrame, money_mode: str = "double"
) -> DataFrame:
    """Cube subtotals over the monthly KPI's dimensions — the
    reference KPI table (reference transform.py:113-128) extended with
    §2.4's grouping machinery (the a_cube_subtotals pattern, tied back
    to the finance fixture): every (entity, month) detail cell PLUS
    per-entity, per-month, and grand-total rows in one pass, with the
    profit identities recomputed at each aggregation level (a
    subtotal's profit is the rounded sum of unrounded amounts, not a
    sum of rounded details — the correct rollup in both money modes).

    'ALL' placeholders derive from ``grouping()``, never from value
    tests, so a genuinely NULL dimension value can never masquerade as
    a subtotal row.  Scale: ``cube`` emits all four grouping sets from
    ONE shuffle with map-side partials — no per-set rescan of the
    fact."""
    round2 = round2_fn(money_mode)
    df = fact.join(
        F.broadcast(dim_accounts.select("account_code", "account_type")),
        "account_code",
        "left",
    ).withColumn("month", F.date_format("date", "yyyy-MM"))
    sums = [
        F.sum(F.when(F.col("account_type") == t, F.col("amount_base"))).alias(t)
        for t in KPI_ACCOUNT_TYPES
    ]
    agg = df.cube("entity", "month").agg(
        *sums,
        F.grouping("entity").alias("_ge"),
        F.grouping("month").alias("_gm"),
    )
    agg = agg.withColumns(
        {
            c: F.coalesce(F.col(c), F.lit(0).cast(agg.schema[c].dataType))
            for c in KPI_ACCOUNT_TYPES
        }
    )
    return (
        agg.select(
            F.when(F.col("_ge") == 1, F.lit("ALL"))
            .otherwise(F.col("entity"))
            .alias("entity"),
            F.when(F.col("_gm") == 1, F.lit("ALL"))
            .otherwise(F.col("month"))
            .alias("month"),
            *KPI_ACCOUNT_TYPES,
        )
        .withColumn(
            "gross_profit", round2(F.col("Revenue") + F.col("COGS"))
        )
        .withColumn(
            "operating_profit",
            round2(F.col("gross_profit") + F.col("Expense")),
        )
        .orderBy("entity", "month")
    )


def add_margins(kpi: DataFrame) -> DataFrame:
    """BI margin enrichment (reference export_bi_datasets.py:45-55).
    Division by zero → null (Spark semantics; SURVEY.md §7.6.5).

    Margin RATIOS are always double — even in decimal money mode —
    because the reference emits them unrounded (a percentage is not
    money), and decimal÷decimal would retype them with an
    engine-chosen scale.  The money columns themselves pass through
    untouched, so a DecimalType KPI stays DecimalType."""
    rev = F.nullif(F.col("Revenue").cast("double"), F.lit(0.0))
    # reference emits margins UNROUNDED (export_bi_datasets.py:45-55:
    # (gp / rev) * 100 with no .round) — full precision preserved here
    # so the golden comparison is exact
    return kpi.withColumns(
        {
            "gross_margin_pct": F.col("gross_profit").cast("double") / rev * 100,
            "operating_margin_pct": F.col("operating_profit").cast("double") / rev * 100,
        }
    )
