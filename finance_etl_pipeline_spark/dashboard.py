"""Dashboard dataset builders (reference scripts/build_dashboard.py:74-225).

The reference renders Plotly HTML; the chart rendering is presentation
(out of engine scope, SURVEY.md §2.1 S6) — these functions produce the
exact datasets the dashboard consumes: revenue trend for the top-8
entities, the month's KPI table, the top-15 expense accounts by
magnitude, and the DQ tables.  Each is a small top-k aggregate
(A8/O2) executed as TakeOrdered, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround


def top_entities_by_revenue(kpi: DataFrame, n: int = 8) -> DataFrame:
    """Top-N entities by total Revenue (reference :100)."""
    return (
        kpi.groupBy("entity")
        .agg(fround(F.sum("Revenue"), 2).alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), "entity")
        .limit(n)
    )


def revenue_trend(kpi: DataFrame, top_entities: DataFrame) -> DataFrame:
    """Per-month Revenue series restricted to the top entities
    (reference :96-138 trend lines)."""
    return (
        kpi.join(F.broadcast(top_entities.select("entity")), "entity")
        .select("entity", "month", "Revenue", "gross_profit", "operating_profit")
        .orderBy("entity", "month")
    )


def top_expense_accounts(
    fact: DataFrame, dim_accounts: DataFrame, n: int = 15
) -> DataFrame:
    """Top-N expense accounts by |amount_base| with 'code - name'
    labels (reference :153-163; case-insensitive type filter :155)."""
    joined = fact.join(
        F.broadcast(dim_accounts.select("account_code", "account_name", "account_type")),
        "account_code",
        "left",
    )
    return (
        joined.filter(F.lower(F.col("account_type")) == "expense")
        .groupBy("account_code", "account_name")
        .agg(fround(F.sum(F.abs(F.col("amount_base"))), 2).alias("total_expense"))
        .select(
            F.concat_ws(" - ", "account_code", "account_name").alias("account"),
            "total_expense",
        )
        .orderBy(F.desc("total_expense"), "account")
        .limit(n)
    )


def kpi_month_table(kpi: DataFrame, month: str) -> DataFrame:
    """The month's KPI rows, margin-enriched (reference :139-152)."""
    from finance_etl_pipeline_spark.transform import add_margins

    return add_margins(kpi.filter(F.col("month") == month)).orderBy("entity")


# ---------------------------------------------------------------------------
# HTML rendering (reference scripts/build_dashboard.py:74-226) —
# dependency-free: the reference embeds Plotly figures; this engine
# renders the same sections with inline SVG (line + bar charts built
# from the collected dataset rows) so the sink works on a headless
# cluster edge node with no plotting stack installed.  All inputs are
# driver-sized BY CONSTRUCTION (top-8 trend, one month's KPI rows,
# top-15 expenses, capped DQ samples) — the collect here is the sink
# boundary, not a compute shortcut.
# ---------------------------------------------------------------------------


def _svg_line_chart(series: dict, title: str, w: int = 640, h: int = 240) -> str:
    """Inline SVG multi-series line chart. ``series`` maps label →
    list of (x_index, y) pairs; x positions are ordinal."""
    pts = [p for ps in series.values() for p in ps]
    if not pts:
        return "<p class='muted'>No data.</p>"
    ys = [y for _, y in pts]
    xs = [x for x, _ in pts]
    y_lo, y_hi = min(ys), max(ys)
    x_lo, x_hi = min(xs), max(xs)
    y_span = (y_hi - y_lo) or 1.0
    x_span = (x_hi - x_lo) or 1
    pad = 36
    colors = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
              "#8c564b", "#e377c2", "#7f7f7f"]
    out = [
        f'<svg viewBox="0 0 {w} {h}" role="img" aria-label="{title}">',
        f'<text x="{w // 2}" y="14" text-anchor="middle" '
        f'font-size="13">{title}</text>',
        f'<line x1="{pad}" y1="{h - pad}" x2="{w - 8}" y2="{h - pad}" '
        'stroke="#999"/>',
        f'<line x1="{pad}" y1="20" x2="{pad}" y2="{h - pad}" stroke="#999"/>',
        f'<text x="4" y="24" font-size="10">{y_hi:,.0f}</text>',
        f'<text x="4" y="{h - pad}" font-size="10">{y_lo:,.0f}</text>',
    ]
    for k, (label, ps) in enumerate(sorted(series.items())):
        if not ps:
            continue
        color = colors[k % len(colors)]
        path = " ".join(
            f"{'M' if i == 0 else 'L'}"
            f"{pad + (x - x_lo) / x_span * (w - pad - 16):.1f},"
            f"{(h - pad) - (y - y_lo) / y_span * (h - pad - 28):.1f}"
            for i, (x, y) in enumerate(sorted(ps))
        )
        out.append(
            f'<path d="{path}" fill="none" stroke="{color}" stroke-width="1.5"/>'
        )
        out.append(
            f'<text x="{w - 120}" y="{30 + 14 * k}" font-size="11" '
            f'fill="{color}">{label}</text>'
        )
    out.append("</svg>")
    return "".join(out)


def _svg_bar_chart(rows: list, title: str, w: int = 640) -> str:
    """Inline SVG horizontal bar chart from (label, value) rows."""
    if not rows:
        return "<p class='muted'>No data.</p>"
    v_hi = max(v for _, v in rows) or 1.0
    bar_h, gap, label_w = 18, 6, 260
    h = 28 + len(rows) * (bar_h + gap)
    out = [
        f'<svg viewBox="0 0 {w} {h}" role="img" aria-label="{title}">',
        f'<text x="{w // 2}" y="14" text-anchor="middle" '
        f'font-size="13">{title}</text>',
    ]
    for i, (label, v) in enumerate(rows):
        y = 24 + i * (bar_h + gap)
        bw = v / v_hi * (w - label_w - 90)
        out.append(
            f'<text x="{label_w - 6}" y="{y + 13}" text-anchor="end" '
            f'font-size="10">{label[:40]}</text>'
        )
        out.append(
            f'<rect x="{label_w}" y="{y}" width="{bw:.1f}" '
            f'height="{bar_h}" fill="#1f77b4"/>'
        )
        out.append(
            f'<text x="{label_w + bw + 4:.1f}" y="{y + 13}" '
            f'font-size="10">{v:,.2f}</text>'
        )
    out.append("</svg>")
    return "".join(out)


def _html_table(df: DataFrame, limit: int = 200) -> str:
    rows = df.limit(limit).collect()
    if not rows:
        return "<p class='muted'>No rows.</p>"
    cols = df.columns
    head = "".join(f"<th>{c}</th>" for c in cols)
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{v:,.2f}</td>" if isinstance(v, float) else f"<td>{v}</td>"
            for v in (row[c] for c in cols)
        )
        + "</tr>"
        for row in rows
    )
    return f"<table><tr>{head}</tr>{body}</table>"


def render_dashboard(
    kpi: DataFrame,
    fact: DataFrame,
    dim_accounts: DataFrame,
    dq_summary: DataFrame | None,
    dq_exceptions: DataFrame | None,
    month: str,
    out_path: str,
) -> str:
    """Render the monthly-close dashboard to a self-contained HTML
    file — the S6 sink (reference scripts/build_dashboard.py:180-225:
    same card sections; charts are inline SVG instead of Plotly)."""
    import os

    top = top_entities_by_revenue(kpi)
    trend_rows = revenue_trend(kpi, top).collect()
    months = sorted({r.month for r in trend_rows})
    m_idx = {m: i for i, m in enumerate(months)}
    rev_series: dict = {}
    op_series: dict = {}
    for r in trend_rows:
        rev_series.setdefault(r.entity, []).append(
            (m_idx[r.month], float(r.Revenue))
        )
        op_series.setdefault(r.entity, []).append(
            (m_idx[r.month], float(r.operating_profit))
        )
    exp_rows = [
        (r.account, float(r.total_expense))
        for r in top_expense_accounts(fact, dim_accounts).collect()
    ]
    html = f"""<!doctype html>
<html>
<head>
  <meta charset="utf-8"/>
  <title>Finance Dashboard - {month}</title>
  <style>
    body {{ font-family: Arial, sans-serif; margin: 24px; }}
    .muted {{ color: #666; font-size: 12px; }}
    .card {{ border: 1px solid #ddd; border-radius: 10px; padding: 16px; margin-bottom: 16px; }}
    table {{ border-collapse: collapse; width: 100%; }}
    th, td {{ border: 1px solid #eee; padding: 8px; font-size: 12px; }}
    th {{ background: #fafafa; }}
  </style>
</head>
<body>
  <h1>Finance Monthly Close Dashboard</h1>
  <p class="muted">Month: <b>{month}</b></p>
  <div class="card">
    <h2>KPI Trend</h2>
    {_svg_line_chart(rev_series, "Revenue by Entity")}
    <br/>
    {_svg_line_chart(op_series, "Operating Profit by Entity")}
  </div>
  <div class="card">
    <h2>KPIs (Selected Month)</h2>
    {_html_table(kpi_month_table(kpi, month))}
  </div>
  <div class="card">
    <h2>Expense Breakdown</h2>
    {_svg_bar_chart(exp_rows, "Top Expense Accounts (Abs Value)")}
  </div>
  <div class="card">
    <h2>Data Quality Summary</h2>
    {_html_table(dq_summary) if dq_summary is not None else "<p class='muted'>No dq_summary</p>"}
    <h3>DQ Exceptions (sample)</h3>
    {_html_table(dq_exceptions) if dq_exceptions is not None else "<p class='muted'>No dq_exceptions</p>"}
  </div>
</body>
</html>"""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(html)
    return out_path
