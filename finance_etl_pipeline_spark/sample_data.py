"""Synthetic finance fixture generator (schemas per FIXTURES.md §A).

Own implementation (std-lib ``random`` + ``csv``; the reference uses
seeded NumPy draws — sample_data.py:9-96 — so values differ, only the
schema/distribution contract matches). Supports injecting targeted
dirty rows so every DQ check path is exercised (FIXTURES.md
"dirty-data variants").
"""

from __future__ import annotations

import csv
import os
import random
from datetime import date, timedelta

ENTITIES = ("TLM", "UPE")
CURRENCIES = ("USD", "TZS", "EUR")
SKUS = ("HONEY-DRUM", "WAX-BLOCK", "GIN-750ML")
REVENUE_CODES = ("40000001", "40000002")
EXPENSE_CODES = ("62000001", "63000001", "64000001")

COA_ROWS = [
    ("10000001", "Cash and Inventory", "Asset"),
    ("11000001", "Accounts Receivable", "Asset"),
    ("20000001", "Accounts Payable", "Liability"),
    ("21000001", "Accrued Liabilities", "Liability"),
    ("40000001", "Product Revenue", "Revenue"),
    ("40000002", "Service Revenue", "Revenue"),
    ("50000001", "Cost of Goods Sold", "COGS"),
    ("61000001", "Payroll Expense", "Expense"),
    ("61000002", "Benefits Expense", "Expense"),
    ("62000001", "Rent Expense", "Expense"),
    ("63000001", "Utilities Expense", "Expense"),
    ("64000001", "Other Expense", "Expense"),
]


def _month_days(month: str) -> list[date]:
    start = date.fromisoformat(f"{month}-01")
    end = (start.replace(day=28) + timedelta(days=5)).replace(day=1)
    days = []
    d = start
    while d < end:
        days.append(d)
        d += timedelta(days=1)
    return days


def _write(path: str, header: list[str], rows: list[list]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def generate_reference(reference_dir: str) -> None:
    _write(
        os.path.join(reference_dir, "chart_of_accounts.csv"),
        ["account_code", "account_name", "account_type"],
        [list(r) for r in COA_ROWS],
    )


def generate_raw(
    raw_dir: str,
    month: str = "2025-12",
    seed: int = 42,
    dirty: bool = False,
) -> None:
    """Five raw CSVs; with ``dirty=True`` adds one targeted bad row per
    DQ check family (amounts ≤ 0, bad currency, duplicate keys, broken
    payroll identity, unknown account code)."""
    rng = random.Random(seed)
    days = _month_days(month)

    fx_rows = []
    for d in days:
        fx_rows.append([d.isoformat(), "USD", "USD", 1.0])
        fx_rows.append([d.isoformat(), "EUR", "USD", round(rng.uniform(1.05, 1.15), 6)])
        fx_rows.append([d.isoformat(), "TZS", "USD", round(rng.uniform(0.00038, 0.00045), 8)])
    _write(
        os.path.join(raw_dir, "fx_rates.csv"),
        ["date", "from_currency", "to_currency", "rate"],
        fx_rows,
    )

    sales_rows = []
    for entity in ENTITIES:
        for i in range(rng.randint(20, 40)):
            sales_rows.append(
                [
                    rng.choice(days).isoformat(),
                    entity,
                    f"INV-{entity}-{i:04d}",
                    rng.choice(REVENUE_CODES),
                    rng.choice(CURRENCIES),
                    round(rng.uniform(200, 5000), 2),
                    f"Sale {i}",
                ]
            )
    if dirty:
        d0 = days[0].isoformat()
        sales_rows.append([d0, "TLM", "INV-TLM-9999", "40000001", "USD", -10.0, "bad amount"])
        sales_rows.append([d0, "TLM", "INV-TLM-9998", "99999999", "USD", 100.0, "bad account"])
        # bad-currency row dated OUTSIDE the month: DQ (which runs on all
        # rows) flags it, but the month filter keeps it out of the fact
        # build so fail_on=NEVER runs don't die at the FX join.
        next_month = (days[-1] + timedelta(days=15)).isoformat()
        sales_rows.append([next_month, "TLM", "INV-TLM-0001", "40000001", "GBP", 100.0, "dup key + bad ccy"])
    _write(
        os.path.join(raw_dir, "sales.csv"),
        ["date", "entity", "invoice_id", "account_code", "currency", "amount", "description"],
        sales_rows,
    )

    exp_rows = []
    for entity in ENTITIES:
        for i in range(rng.randint(25, 55)):
            exp_rows.append(
                [
                    rng.choice(days).isoformat(),
                    entity,
                    f"BILL-{entity}-{i:04d}",
                    rng.choice(EXPENSE_CODES),
                    rng.choice(CURRENCIES),
                    round(rng.uniform(50, 2500), 2),
                    f"Expense {i}",
                ]
            )
    if dirty:
        # non-numeric amount: PERMISSIVE CSV read nulls it out, the
        # required(amount) check fires (SURVEY.md §7.6.8 dtype story)
        exp_rows.append([days[1].isoformat(), "UPE", "BILL-UPE-9999", "62000001", "USD", "not-a-number", "dtype"])
    _write(
        os.path.join(raw_dir, "expenses.csv"),
        ["date", "entity", "bill_id", "account_code", "currency", "amount", "description"],
        exp_rows,
    )

    pay_rows = []
    for entity in ENTITIES:
        for i in range(10):
            gross = round(rng.uniform(800, 3000), 2)
            deductions = round(gross * rng.uniform(0.1, 0.3), 2)
            net = round(gross - deductions, 2)
            pay_rows.append(
                [month, entity, f"EMP-{entity}-{i:03d}", rng.choice(("USD", "TZS")), gross, deductions, net]
            )
    if dirty:
        pay_rows.append([month, "UPE", "EMP-UPE-999", "USD", 1000.0, 100.0, 500.0])
    _write(
        os.path.join(raw_dir, "payroll.csv"),
        ["month", "entity", "employee_id", "currency", "gross", "deductions", "net"],
        pay_rows,
    )

    inv_rows = []
    for entity in ENTITIES:
        for _ in range(rng.randint(20, 40)):
            inv_rows.append(
                [
                    rng.choice(days).isoformat(),
                    entity,
                    rng.choice(SKUS),
                    rng.choice(("receipt", "issue", "adjustment")),
                    round(rng.uniform(1, 50), 2),
                    round(rng.uniform(2, 80), 2),
                    rng.choice(CURRENCIES),
                ]
            )
    if dirty:
        inv_rows.append([days[0].isoformat(), "TLM", "WAX-BLOCK", "teleport", 5.0, 10.0, "USD"])
    _write(
        os.path.join(raw_dir, "inventory_movements.csv"),
        ["date", "entity", "sku", "movement_type", "qty", "unit_cost", "currency"],
        inv_rows,
    )


# ---------------------------------------------------------------------------
# Reference-exact fixture (seed-42 NumPy draw twin)
# ---------------------------------------------------------------------------

def generate_raw_reference_twin(
    raw_dir: str, month: str = "2025-12", seed: int = 42
) -> None:
    """Raw CSVs whose VALUES are bit-identical to the reference
    generator's output (reference src/finance_etl/sample_data.py:9-96).

    ``generate_raw`` above is this repo's own fixture (std-lib RNG,
    different draws); this twin instead replays the reference's exact
    NumPy draw sequence so the pipeline output can be asserted against
    the reference's COMMITTED goldens (data/bi/2025-12/*.csv) — the
    "switch engines, keep your numbers" guarantee a migrating user
    checks first.

    Draw-order contract (any deviation desynchronizes the stream):
    one ``seed(42)`` up front; per day 2 uniforms (EUR, TZS); per
    sales row choice(dates) → choice(ccy, p) → uniform → choice(acct,
    p); per expense row choice(dates) → choice(ccy, p) → uniform →
    choice(acct); per payroll row choice(ccy, p) → 2 uniforms; per
    inventory row choice(dates) → choice(sku) → choice(move, p) →
    3 draws.  Floats are written via ``str(float(x))`` = shortest
    round-trip repr, the same text pandas ``to_csv`` emits, so the
    CSV→double parse is identical in any engine.
    """
    import numpy as np

    days = _month_days(month)
    iso = [d.isoformat() for d in days]

    np.random.seed(seed)

    fx_rows = []
    for d in iso:
        fx_rows.append([d, "USD", "USD", 1.0])
        fx_rows.append([d, "EUR", "USD", float(np.random.uniform(1.05, 1.15))])
        fx_rows.append([d, "TZS", "USD", float(np.random.uniform(0.00038, 0.00045))])
    _write(
        os.path.join(raw_dir, "fx_rates.csv"),
        ["date", "from_currency", "to_currency", "rate"],
        fx_rows,
    )

    # currency list order is draw-significant: the p-vector pairs
    # positionally (USD .5, TZS .4, EUR .1)
    ref_ccys = ["USD", "TZS", "EUR"]

    sales_rows = []
    for entity in ENTITIES:
        n = int(np.random.randint(20, 40))
        for i in range(n):
            d = str(np.random.choice(iso))
            ccy = str(np.random.choice(ref_ccys, p=[0.5, 0.4, 0.1]))
            amt = float(np.random.uniform(200, 5000))
            acct = str(np.random.choice(["40000001", "40000002"], p=[0.7, 0.3]))
            sales_rows.append(
                [d, entity, f"INV-{entity}-{i:04d}", acct, ccy, amt, "Synthetic sale"]
            )
    _write(
        os.path.join(raw_dir, "sales.csv"),
        ["date", "entity", "invoice_id", "account_code", "currency", "amount", "description"],
        sales_rows,
    )

    exp_rows = []
    for entity in ENTITIES:
        n = int(np.random.randint(25, 55))
        for i in range(n):
            d = str(np.random.choice(iso))
            ccy = str(np.random.choice(ref_ccys, p=[0.5, 0.4, 0.1]))
            amt = float(np.random.uniform(50, 2500))
            acct = str(np.random.choice(["62000001", "63000001", "64000001"]))
            exp_rows.append(
                [d, entity, f"BILL-{entity}-{i:04d}", acct, ccy, amt, "Synthetic expense"]
            )
    _write(
        os.path.join(raw_dir, "expenses.csv"),
        ["date", "entity", "bill_id", "account_code", "currency", "amount", "description"],
        exp_rows,
    )

    pay_rows = []
    for entity in ENTITIES:
        for i in range(10):
            ccy = str(np.random.choice(["USD", "TZS"], p=[0.4, 0.6]))
            gross = float(np.random.uniform(300, 1500))
            deductions = float(np.random.uniform(0, 150))
            net = float(round(gross - deductions, 2))
            pay_rows.append(
                [month, entity, f"EMP-{entity}-{i:03d}", ccy, gross, deductions, net]
            )
    _write(
        os.path.join(raw_dir, "payroll.csv"),
        ["month", "entity", "employee_id", "currency", "gross", "deductions", "net"],
        pay_rows,
    )

    inv_rows = []
    for entity in ENTITIES:
        n = int(np.random.randint(20, 40))
        for _ in range(n):
            d = str(np.random.choice(iso))
            sku = str(np.random.choice(list(SKUS)))
            move = str(
                np.random.choice(["receipt", "issue", "adjustment"], p=[0.45, 0.45, 0.10])
            )
            qty = float(np.random.uniform(1, 50))
            unit_cost = float(np.random.uniform(2, 80))
            ccy = str(np.random.choice(ref_ccys, p=[0.5, 0.4, 0.1]))
            inv_rows.append([d, entity, sku, move, qty, unit_cost, ccy])
    _write(
        os.path.join(raw_dir, "inventory_movements.csv"),
        ["date", "entity", "sku", "movement_type", "qty", "unit_cost", "currency"],
        inv_rows,
    )
