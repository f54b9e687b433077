"""Privacy-preserving record linkage: CLK Bloom-filter encodings.

Schnell, Bachteler & Reiher (2009): encode each record's quasi-identifier
into a Bloom filter by hashing its padded character bigrams through k
hash functions into an m-bit filter, then compare filters with the Dice
coefficient — similar names yield similar bit patterns without either
party revealing the cleartext. The standard PPRL baseline (and the one
real linkage units actually deploy), it turns a privacy constraint into
a plain set-similarity problem the rest of this engine already handles.

Spark-first shape: the encoding is pure column expressions (transform /
flatten / array_distinct over substrings + md5 — JVM-side, codegen'd, no
UDF), so building 10^12 encodings is a scan, not a shuffle. We represent
the filter as the sorted DISTINCT POSITION SET rather than a packed
bitmask: Dice needs only |A∩B| and the set sizes, array_intersect gives
both, and the set form stays oracle-checkable in ANSI SQL (the DuckDB
mirror builds the identical position lists). A packed-uint64 variant
would save bytes but buys nothing until the filter leaves the engine.

Position hashing uses the double-hashing trick degenerated to k
independent md5 draws: position_j(g) = int(md5(g || '#' || j)[-2:]) % m
— byte-identical between Spark (conv(substring(md5,31,2),16,10)) and
DuckDB (nibble strpos arithmetic), so the oracle rebuilds the exact
filters.

Reference parity: the reference has no PPRL surface (backend/rlr.py
compares cleartext fields); this extends the comparator family the same
way fs_score_tf extends C3.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clk_positions(text: Column, m: int = 64, k: int = 4) -> Column:
    """Distinct Bloom-filter positions for the padded character bigrams
    of ``text``. NULL-safe (NULL encodes like the empty string, whose
    single padded bigram '__' still yields k positions — a non-empty
    filter, so Dice against it is defined)."""
    t = F.concat(F.lit("_"), F.lower(F.trim(F.coalesce(text, F.lit("")))), F.lit("_"))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2)),
        )
    )
    pos = F.flatten(
        F.transform(
            grams,
            lambda g: F.transform(
                F.sequence(F.lit(1), F.lit(k)),
                lambda j: (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(g, F.lit("#"), j.cast("string"))), 31, 2
                        ),
                        16,
                        10,
                    ).cast("int")
                    % m
                ),
            ),
        )
    )
    return F.array_sort(F.array_distinct(pos))


def dice(l_pos: Column, r_pos: Column) -> Column:
    """Dice coefficient 2|A∩B|/(|A|+|B|) over two position sets."""
    inter = F.size(F.array_intersect(l_pos, r_pos)).cast("double")
    tot = (F.size(l_pos) + F.size(r_pos)).cast("double")
    return F.coalesce(F.try_divide(F.lit(2.0) * inter, tot), F.lit(0.0))


def clk_positions_sql(text_expr: str, m: int = 64, k: int = 4) -> str:
    """DuckDB mirror of :func:`clk_positions` (same padded bigrams, same
    md5 tail-byte position hashing)."""
    t = f"'_' || lower(trim(coalesce({text_expr}, ''))) || '_'"
    nib = "strpos('0123456789abcdef', substr(md5(g || '#' || j), {i}, 1)) - 1"
    byte = f"(({nib.format(i=31)}) * 16 + ({nib.format(i=32)}))"
    return (
        "list_sort(list_distinct(flatten(list_transform("
        f"list_distinct(list_transform(range(1, len({t})), i -> substr({t}, i::INTEGER, 2))), "
        f"g -> list_transform(range(1, {k + 1}), j -> {byte} % {m})))))"
    )


def dice_sql(l_expr: str, r_expr: str) -> str:
    return (
        f"coalesce(2.0 * len(list_intersect({l_expr}, {r_expr}))::DOUBLE"
        f" / nullif((len({l_expr}) + len({r_expr}))::DOUBLE, 0), 0.0)"
    )
