"""S9 HTML dashboard renderer — the reference's report stack, Spark-sized.

The reference ships ~4k LoC of dashboard renderers (m00_utils/
dashboard_views.py:573-760 per-module panels + pipeline shell,
dashboard_core.py metric cards, dashboard_plots.py chart embeds,
report_html.py page scaffolding). This module reproduces that surface as one
self-contained driver-side renderer:

- a status banner + metric tiles (module counts, health score),
- one panel per pipeline module: status badge, summary key/values, and the
  module's report table,
- inline-SVG histogram and box plots built from ALREADY-AGGREGATED data
  (operators/visuals.py outputs: bin counts and five-number summaries).

Scale posture: everything rendered here is a small collected aggregate by
construction — the renderer never touches the distributed table. The plots
take the *aggregate rows* (30 bins, 9 numbers per box), not the data, so the
page is the same size whether the input was 60k rows or 100 TB.
"""

from __future__ import annotations

import html
import os
from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame

_CSS = """
body{font-family:-apple-system,'Segoe UI',sans-serif;margin:0;background:#f4f5f7;color:#1f2430}
.wrap{max-width:1080px;margin:0 auto;padding:24px}
h1{font-size:22px;margin:0 0 4px}h2{font-size:17px;margin:24px 0 8px}h3{font-size:14px;margin:0 0 8px}
.banner{display:flex;flex-wrap:wrap;gap:16px;padding:12px 16px;border-radius:8px;margin:16px 0;
 background:#e8f0e9;border:1px solid #bcd6c0}
.banner.warn{background:#fbeeea;border-color:#e4bdb3}
.banner-item{font-size:13px}
.tiles{display:flex;flex-wrap:wrap;gap:12px;margin:12px 0}
.tile{flex:1 1 140px;background:#fff;border:1px solid #dfe2e8;border-radius:8px;padding:12px 16px}
.tile .v{font-size:24px;font-weight:600}.tile .l{font-size:12px;color:#5b6270}
.tile.pass{border-left:4px solid #3d8b4f}.tile.warn{border-left:4px solid #c96a3b}
.tile.fail{border-left:4px solid #b33a3a}
.panel{background:#fff;border:1px solid #dfe2e8;border-radius:8px;padding:16px;margin:12px 0}
.badge{display:inline-block;padding:2px 10px;border-radius:10px;font-size:12px;font-weight:600}
.badge.completed,.badge.passed,.badge.pass{background:#e2f1e5;color:#2c6e3c}
.badge.failed,.badge.fail{background:#f7e1de;color:#9c2f2f}
.badge.skipped,.badge.not_run{background:#eceef2;color:#5b6270}
table{border-collapse:collapse;margin:8px 0;font-size:13px;width:100%}
td,th{border:1px solid #dfe2e8;padding:4px 10px;text-align:left;vertical-align:top}
th{background:#f0f2f5;font-weight:600}
.num{text-align:right;font-variant-numeric:tabular-nums}
.subtle{color:#5b6270;font-size:12px}
svg text{font-family:inherit}
"""

_MAX_TABLE_ROWS = 200


# -- generic pieces ----------------------------------------------------------


def _esc(v: Any) -> str:
    return html.escape(str(v))


def _fmt(v: Any) -> str:
    if isinstance(v, float):
        return f"{v:,.4f}".rstrip("0").rstrip(".") if v == v else "NaN"
    return str(v)


def _rows_of(table: Any) -> list[dict]:
    """Report payloads arrive as DataFrame (small aggregate), list[Row|dict],
    or plain dict — normalize to row dicts, bounded."""
    if isinstance(table, DataFrame):
        return [r.asDict(recursive=True) for r in table.limit(_MAX_TABLE_ROWS).collect()]
    if isinstance(table, Mapping):
        return [{"key": k, "value": v} for k, v in table.items()]
    if isinstance(table, Iterable) and not isinstance(table, (str, bytes)):
        out = []
        for r in table:
            out.append(r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r) if isinstance(r, Mapping) else {"value": r})
            if len(out) >= _MAX_TABLE_ROWS:
                break
        return out
    return [{"value": table}]


def render_table(table: Any) -> str:
    rows = _rows_of(table)
    if not rows:
        return "<p class='subtle'>empty</p>"
    cols = list(rows[0].keys())
    head = "".join(f"<th>{_esc(c)}</th>" for c in cols)
    body = []
    for r in rows:
        tds = []
        for c in cols:
            v = r.get(c)
            cls = " class='num'" if isinstance(v, (int, float)) and not isinstance(v, bool) else ""
            tds.append(f"<td{cls}>{_esc(_fmt(v)) if v is not None else ''}</td>")
        body.append("<tr>" + "".join(tds) + "</tr>")
    return f"<table><thead><tr>{head}</tr></thead><tbody>{''.join(body)}</tbody></table>"


def _badge(status: str) -> str:
    s = str(status).lower()
    return f"<span class='badge {_esc(s)}'>{_esc(s.upper())}</span>"


def _tile(label: str, value: Any, tone: str = "") -> str:
    return f"<div class='tile {tone}'><div class='v'>{_esc(_fmt(value))}</div><div class='l'>{_esc(label)}</div></div>"


# -- inline SVG charts over aggregate rows -----------------------------------


def histogram_svg(bins: Any, width: int = 640, height: int = 180, title: str = "") -> str:
    """Bar chart from ``visuals.histogram`` output rows (bin, lo, hi, count).
    Input is the AGGREGATE (≤ a few hundred bins) — never raw data."""
    rows = sorted(_rows_of(bins), key=lambda r: r.get("bin", 0))
    if not rows:
        return ""
    pad, axis = 8, 28
    max_c = max(int(r["count"]) for r in rows) or 1
    n = len(rows)
    bw = (width - 2 * pad) / n
    parts = [
        f"<svg viewBox='0 0 {width} {height + axis}' width='{width}' height='{height + axis}' role='img'>"
    ]
    if title:
        parts.append(f"<text x='{pad}' y='14' font-size='12' fill='#5b6270'>{_esc(title)}</text>")
    for i, r in enumerate(rows):
        c = int(r["count"])
        h = (height - 24) * c / max_c
        x, y = pad + i * bw, height - h
        parts.append(
            f"<rect x='{x:.1f}' y='{y:.1f}' width='{max(bw - 1, 1):.1f}' height='{h:.1f}' fill='#4878a8'>"
            f"<title>[{_fmt(r['lo'])}, {_fmt(r['hi'])}): {c}</title></rect>"
        )
    lo0, hi1 = rows[0]["lo"], rows[-1]["hi"]
    parts.append(f"<text x='{pad}' y='{height + 16}' font-size='11' fill='#5b6270'>{_fmt(lo0)}</text>")
    parts.append(
        f"<text x='{width - pad}' y='{height + 16}' font-size='11' fill='#5b6270' text-anchor='end'>{_fmt(hi1)}</text>"
    )
    parts.append("</svg>")
    return "".join(parts)


def boxplot_svg(stats: Any, width: int = 640, row_h: int = 44) -> str:
    """Horizontal box-and-whisker per column from ``visuals.boxplot_stats``
    rows (column, min, q1, median, q3, max, lo_whisker, hi_whisker,
    n_outliers) — nine numbers per column, not data."""
    rows = _rows_of(stats)
    if not rows:
        return ""
    pad_l, pad_r = 130, 16
    height = row_h * len(rows) + 24
    parts = [f"<svg viewBox='0 0 {width} {height}' width='{width}' height='{height}' role='img'>"]
    for i, r in enumerate(rows):
        lo, hi = float(r["min"]), float(r["max"])
        span = (hi - lo) or 1.0

        def x(v: float) -> float:
            return pad_l + (width - pad_l - pad_r) * (float(v) - lo) / span

        cy = 20 + i * row_h
        q1, q3, med = x(r["q1"]), x(r["q3"]), x(r["median"])
        wlo, whi = x(r["lo_whisker"]), x(r["hi_whisker"])
        parts.append(
            f"<text x='4' y='{cy + 4}' font-size='12' fill='#1f2430'>{_esc(r['column'])}</text>"
            f"<line x1='{wlo:.1f}' x2='{whi:.1f}' y1='{cy}' y2='{cy}' stroke='#5b6270'/>"
            f"<line x1='{wlo:.1f}' x2='{wlo:.1f}' y1='{cy - 7}' y2='{cy + 7}' stroke='#5b6270'/>"
            f"<line x1='{whi:.1f}' x2='{whi:.1f}' y1='{cy - 7}' y2='{cy + 7}' stroke='#5b6270'/>"
            f"<rect x='{q1:.1f}' y='{cy - 10}' width='{max(q3 - q1, 1):.1f}' height='20' fill='#9ec2e0' stroke='#4878a8'>"
            f"<title>{_esc(r['column'])}: q1={_fmt(r['q1'])} med={_fmt(r['median'])} q3={_fmt(r['q3'])} "
            f"fliers={r.get('n_outliers', 0)}</title></rect>"
            f"<line x1='{med:.1f}' x2='{med:.1f}' y1='{cy - 10}' y2='{cy + 10}' stroke='#1f2430' stroke-width='2'/>"
        )
    parts.append("</svg>")
    return "".join(parts)


# -- pipeline dashboard ------------------------------------------------------

_MODULE_REPORT_KEYS = {
    "diagnostics": "diagnostics",
    "validation": "validation",
    "normalization": "normalization",
    "validation_gatekeeper": "validation_gatekeeper",
    "imputation": "imputation",
    "final_audit": "final_audit",
}


def render_pipeline_dashboard(
    run: Any,
    title: str = "Pipeline Dashboard",
    charts: Mapping[str, str] | None = None,
) -> str:
    """Full pipeline review page from a :class:`PipelineRun`
    (reference render_pipeline_dashboard, dashboard_views.py:657-760):
    banner → metric tiles → per-module panels (status badge + summary +
    report table) → optional chart sections (pre-rendered SVG strings)."""
    history = list(getattr(run, "history", []))
    reports = dict(getattr(run, "reports", {}))
    health = dict(getattr(run, "health", {}) or {})

    statuses = [h["status"] for h in history]
    n_fail = sum(1 for s in statuses if s == "failed")
    final_status = "failed" if n_fail else ("completed" if history else "not_run")
    score = health.get("overall_score", health.get("score", "N/A"))
    h_status = str(health.get("status", "unknown")).upper()

    banner_cls = "warn" if n_fail else ""
    out = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head><body><div class='wrap'>",
        f"<h1>{_esc(title)}</h1>",
        f"<p class='subtle'>run_id: {_esc(getattr(run, 'run_id', ''))}</p>",
        f"<div class='banner {banner_cls}'>",
        f"<div class='banner-item'><strong>Final status:</strong> {_esc(final_status.upper())}</div>",
        f"<div class='banner-item'><strong>Health:</strong> {_esc(score)} ({_esc(h_status)})</div>",
        f"<div class='banner-item'><strong>Modules:</strong> {len(history)}</div>",
        "</div>",
        "<div class='tiles'>",
        _tile("modules run", len(history)),
        _tile("completed", sum(1 for s in statuses if s == "completed"), "pass"),
        _tile("failed", n_fail, "fail" if n_fail else "pass"),
        _tile("health score", score, "pass" if str(h_status).lower() in ("green", "good", "excellent") else "warn"),
        "</div>",
    ]

    for h in history:
        module = h["module"]
        out.append("<div class='panel'>")
        out.append(f"<h2>{_esc(module)} {_badge(h['status'])}</h2>")
        summary = h.get("summary") or {}
        if summary:
            out.append("<h3>Summary</h3>")
            out.append(render_table(summary))
        rpt = reports.get(_MODULE_REPORT_KEYS.get(module, module))
        if rpt is not None and rpt != summary:
            out.append("<h3>Report</h3>")
            out.append(render_table(rpt))
        out.append("</div>")

    for name, svg in (charts or {}).items():
        if not svg:
            continue
        out.append(f"<div class='panel'><h2>{_esc(name)}</h2>{svg}</div>")

    out.append("</div></body></html>")
    return "\n".join(out)


def export_pipeline_dashboard(
    run: Any,
    path: str,
    df: DataFrame | None = None,
    viz_columns: list[str] | None = None,
    title: str = "Pipeline Dashboard",
    bins: int = 30,
) -> str:
    """Render and write the dashboard. When ``df``/``viz_columns`` are given,
    compute histogram + box aggregates for those columns (bounded single-pass
    aggs via operators/visuals) and embed them as inline SVG."""
    charts: dict[str, str] = {}
    if df is not None and viz_columns:
        from analyst_toolkit_spark.operators import visuals as M_vis

        box = M_vis.boxplot_stats(df, viz_columns)
        charts["Distribution overview (box)"] = boxplot_svg(box)
        for c in viz_columns:
            charts[f"Histogram — {c}"] = histogram_svg(M_vis.histogram(df, c, bins=bins), title=c)
    page = render_pipeline_dashboard(run, title=title, charts=charts)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(page)
    return path
