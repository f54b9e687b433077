"""Text extraction from raw page bytes — vectorized Arrow UDF, byte-identical.

The north rule's per-row invariant (BASELINE.json input_hint): extracted
text must be **byte-identical per url** to the authored ``text``. The
extractor is therefore a pure function of the ``html`` bytes: it locates
the body-paragraph span in the fixed template and decodes exactly those
bytes, with no Unicode normalization, whitespace folding, or entity
rewriting anywhere in the path. ``html`` stays ``BinaryType`` end-to-end
so Arrow can't sneak in an encoding conversion (SURVEY.md §7.3).

Vectorized: a scalar ``pandas_udf`` over the binary series (Arrow batch
transfer, no per-row Python dispatch from Spark's perspective). At 100 TB
this runs embarrassingly parallel over input partitions — no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OPEN = b"<body><p>"
_CLOSE = b"</p></body>"


def extract_text_bytes(html: bytes | None) -> str | None:
    """Pure function bytes -> text. The single source of extraction truth."""
    if html is None:
        return None
    start = html.find(_OPEN)
    if start < 0:
        return None
    start += len(_OPEN)
    end = html.rfind(_CLOSE)
    if end < 0 or end < start:
        return None
    return html[start:end].decode("utf-8")


@F.pandas_udf(T.StringType())
def _extract_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


def extract_text(pages: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """web_pages(url, warc_ts, html, ...) -> same + extracted ``out_col``.

    Narrow (no shuffle); Catalyst prunes ``html`` out of any downstream
    stage that doesn't reference it, so keep this projection early and
    drop ``html`` immediately after extraction in the pipeline.
    """
    return pages.withColumn(out_col, _extract_udf(F.col(html_col)))
