"""Phonetic encoding (American Soundex) for blocking keys.

Phonetic blocking is the oldest trick in record linkage: "Smith" /
"Smyth" / "Smithe" land in one block because their Soundex code is
S530. The reference blocks only on exact normalized values
(backend/rlr.py group keys); a name-heavy linkage needs a key that
survives spelling variation, and Soundex is the standard first choice
(with the H/W transparency rule, the variant used by the US Census
and by most SQL engines' SOUNDEX()).

Implementation note — why not Spark's built-in ``F.soundex``: the
built-in is JVM-private; its exact H/W and padding semantics can't be
mirrored verbatim in DuckDB, and a blocking KEY must be reproducible
by any engine touching the data. Both sides here are generated from
ONE spec table (letter→digit map + the batch pipeline below), so the
Spark column expression and the DuckDB SQL cannot drift:

1. strip non-letters, uppercase, cap at 64 chars (keys are names /
   domains, not documents; the cap bounds the collapse depth).
2. translate letters to digits — vowels(AEIOUY)→0, H/W→7.
3. delete 7s  (H/W are *transparent*: same-code letters separated
   only by h/w code once).
4. collapse adjacent equal digits (runs ≤64 ⇒ 6 halving passes of
   ``replace(dd → d)`` per digit — RE2 in DuckDB has no
   backreferences, so the collapse is plain nested replace, identical
   in both engines).
5. delete 0s  (vowels separate duplicates — AFTER the collapse, so
   '101' keeps both 1s).
6. drop ONE leading digit iff the first letter's own code is 1–6
   (its run is the first collapsed char); vowel/H/W first letters
   contribute no digit.
7. first letter + first 3 remaining digits, right-padded with 0.

Everything is whole-stage-codegen string ops — no UDFs; the key is
computed scan-side and is a perfectly shuffle-friendly block key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_DIGITS = "01230127022455012623017202"  # A..Z; 0=vowel/Y, 7=H/W
_MAXLEN = 64
_HALVINGS = 6  # 2^6 = 64 >= longest possible run


def soundex_col(c: Column) -> Column:
    """American Soundex (H/W rule) as a pure column expression.

    NULL → NULL; strings with no letters → ''.
    """
    s = F.substring(F.upper(F.regexp_replace(c, "[^A-Za-z]", "")), 1, _MAXLEN)
    first = F.substring(s, 1, 1)
    d = F.translate(s, _LETTERS, _DIGITS)
    d = F.regexp_replace(d, "7", "")
    for dig in "123456":
        for _ in range(_HALVINGS):
            d = F.regexp_replace(d, dig + dig, dig)
    d = F.regexp_replace(d, "0", "")
    fc = F.translate(first, _LETTERS, _DIGITS)
    tail = F.when(
        fc.between("1", "6"), F.substring(d, 2, 3)
    ).otherwise(F.substring(d, 1, 3))
    return F.when(s == "", F.lit("")).otherwise(
        F.rpad(F.concat(first, tail), 4, "0")
    )


def soundex_sql(expr: str) -> str:
    """DuckDB expression computing the identical code (the oracle
    side), generated from the same spec constants and the same
    halving-collapse loop."""
    s = (
        f"substr(upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g')), 1, {_MAXLEN})"
    )
    d = f"translate({s}, '{_LETTERS}', '{_DIGITS}')"
    d = f"replace({d}, '7', '')"
    for dig in "123456":
        for _ in range(_HALVINGS):
            d = f"replace({d}, '{dig + dig}', '{dig}')"
    d = f"replace({d}, '0', '')"
    first = f"substr({s}, 1, 1)"
    fc = f"translate({first}, '{_LETTERS}', '{_DIGITS}')"
    return (
        f"CASE WHEN {s} = '' THEN '' "
        f"WHEN {s} IS NULL THEN NULL "
        f"ELSE rpad({first} || "
        f"CASE WHEN {fc} BETWEEN '1' AND '6' "
        f"THEN substr({d}, 2, 3) ELSE substr({d}, 1, 3) END, 4, '0') END"
    )
