"""Driver-side text rendering — the reference's CLI review surface.

The reference's CL_* functions (backend/rlr.py:376-512) render a pair's
grouped values side by side with exact-match highlighting and a label
summary box. These are presentation, not Spark operators (SURVEY.md
§2.1 last row); they live here as thin formatters over the engine's
DataFrames so a reviewer can spot-check pairs from the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from rlr_spark.operators.review import label_counts


def render_pair(
    grouped_row, var_schema: list[dict], width: int = 80
) -> str:
    """One pair as a three-column text table (≈ CL_print_comparison_full,
    rlr.py:409-436): lvals | group name | rvals, '=' flag when the
    normalized concat matches (the pages/02:137-143 comparator)."""
    col = (width - 7) // 3
    lines = ["-" * width]
    for g in var_schema:
        name = g["name"].lower().replace(" ", "_")
        lvals = list(grouped_row[f"grp_{name}_lvals"])
        rvals = list(grouped_row[f"grp_{name}_rvals"])
        same = "".join(str(v).strip().lower() for v in lvals) == "".join(
            str(v).strip().lower() for v in rvals
        )
        mark = "=" if same else " "
        for i in range(max(len(lvals), len(rvals))):
            lv = str(lvals[i]) if i < len(lvals) else ""
            rv = str(rvals[i]) if i < len(rvals) else ""
            mid = g["name"] if i == 0 else ""
            lines.append(
                f"{lv[:col]:>{col}} | {mid[:col]:^{col}} {mark} | {rv[:col]:<{col}}"
            )
        lines.append("-" * width)
    return "\n".join(lines)


def render_label_summary(pairs: DataFrame, label_choices: list[str] | None = None) -> str:
    """Label summary box (≈ CL_print_label_summary, rlr.py:479-512)."""
    counts = {r.label: r["count"] for r in label_counts(pairs, label_choices).collect()}
    total = sum(counts.values())
    width = max([len(k) for k in counts] + [10]) + 14
    lines = ["+" + "-" * width + "+", "|" + "Label Summary".center(width) + "|"]
    lines.append("+" + "-" * width + "+")
    order = (label_choices or []) + [k for k in sorted(counts) if k not in (label_choices or [])]
    seen = set()
    for label in order:
        if label in counts and label not in seen:
            seen.add(label)
            n = counts[label]
            pct = 100 * n / total if total else 0
            lines.append(f"| {label:<{width - 16}} {n:>6} {pct:5.1f}% |")
    lines.append("+" + "-" * width + "+")
    lines.append(f"| {'Total':<{width - 9}} {total:>6} |")
    lines.append("+" + "-" * width + "+")
    return "\n".join(lines)
