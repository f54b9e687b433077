"""Token-level standardization: the preprocessing step every linkage
textbook (Christen, *Data Matching*, ch. 2) puts before any comparator —
map nickname and abbreviation variants onto canonical forms so "Bob
Smith, 12 Main St" and "Robert Smith, 12 Main Street" agree EXACTLY and
never reach the fuzzy comparators at all. Cheap standardization upstream
beats expensive similarity downstream: an exact-key block on the
canonical form is O(n), a Jaro-Winkler pass over the un-standardized
pairs is O(candidate pairs).

Spark-first shape: the dictionary rides into the plan as a literal MAP
expression (``F.create_map``) and the rewrite is
``transform(tokens, t -> coalesce(map[t], t))`` — pure codegen column
ops, no UDF, no join, no shuffle; a 10^12-row standardization pass is a
scan. For dictionaries too large for a literal (gazetteer-scale), fall
back to explode + broadcast join; the built-in tables here are dozens
of entries, far below that line.

``replace_tokens_sql`` generates the DuckDB mirror from the SAME
dictionary, so standardized columns stay oracle-checkable.

The built-in tables are small, public-knowledge standards: common
English nickname→formal pairs and USPS-style street-suffix expansions.
Domain dictionaries are a parameter, not a hardcode.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

# common English nickname -> formal given name (public knowledge;
# lowercase; deliberately only unambiguous one-to-one entries)
NICKNAMES: dict[str, str] = {
    "bob": "robert", "rob": "robert", "bobby": "robert",
    "bill": "william", "billy": "william", "will": "william",
    "liz": "elizabeth", "beth": "elizabeth", "betty": "elizabeth",
    "dick": "richard", "rick": "richard", "rich": "richard",
    "jim": "james", "jimmy": "james",
    "joe": "joseph", "joey": "joseph",
    "tom": "thomas", "tommy": "thomas",
    "ted": "edward", "ed": "edward", "eddie": "edward",
    "tony": "anthony",
    "kate": "katherine", "kathy": "katherine", "katie": "katherine",
    "peggy": "margaret", "meg": "margaret",
    "mike": "michael", "mick": "michael",
    "dave": "david",
    "dan": "daniel", "danny": "daniel",
    "chris": "christopher",
    "steve": "steven",
    "andy": "andrew", "drew": "andrew",
    "nick": "nicholas",
    "sam": "samuel",
    "ben": "benjamin",
    "alex": "alexander",
    "chuck": "charles", "charlie": "charles",
    "hank": "henry",
    "jack": "john", "johnny": "john",
    "jen": "jennifer", "jenny": "jennifer",
    "sue": "susan", "susie": "susan",
    "patty": "patricia", "trish": "patricia",
    "nancy": "ann",
    "larry": "lawrence",
    "jerry": "gerald",
    "frank": "francis",
    "fred": "frederick", "freddie": "frederick",
    "greg": "gregory",
    "ron": "ronald", "ronnie": "ronald",
    "ken": "kenneth", "kenny": "kenneth",
    "don": "donald", "donnie": "donald",
}

# USPS-style street suffix / unit abbreviations -> expanded form
ADDRESS_ABBREV: dict[str, str] = {
    "st": "street", "str": "street",
    "ave": "avenue", "av": "avenue",
    "rd": "road",
    "blvd": "boulevard",
    "dr": "drive",
    "ln": "lane",
    "ct": "court",
    "pl": "place",
    "sq": "square",
    "hwy": "highway",
    "pkwy": "parkway",
    "cir": "circle",
    "ter": "terrace",
    "apt": "apartment",
    "ste": "suite",
    "fl": "floor",
    "n": "north", "s": "south", "e": "east", "w": "west",
    "ne": "northeast", "nw": "northwest",
    "se": "southeast", "sw": "southwest",
    "mt": "mount",
    "ft": "fort",
    "corp": "corporation",
    "co": "company",
    "inc": "incorporated",
    "ltd": "limited",
}


def replace_tokens(c: Column, mapping: dict[str, str]) -> Column:
    """Lower/trim, split on whitespace, map each token through
    ``mapping`` (unmapped tokens pass through), re-join with single
    spaces. Trailing punctuation on a token blocks the match by design
    — strip punctuation first if the data carries it."""
    if not mapping:
        raise ValueError("empty mapping")
    m = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(sorted(mapping.items()))]
    )
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    return F.array_join(
        F.transform(toks, lambda t: F.coalesce(m[t], t)), " "
    )


def replace_tokens_sql(expr: str, mapping: dict[str, str]) -> str:
    """DuckDB mirror of :func:`replace_tokens` over the same mapping."""
    if not mapping:
        raise ValueError("empty mapping")
    entries = ", ".join(
        f"'{k}': '{v}'" for k, v in sorted(mapping.items())
    )
    # DuckDB map subscript yields a LIST ([] when absent) — index [1]
    # turns that into value-or-NULL for the coalesce passthrough
    return (
        "array_to_string(list_transform("
        f"string_split(lower(trim({expr})), ' '), "
        f"t -> coalesce((MAP {{{entries}}}[t])[1], t)), ' ')"
    )


def standardize_name(c: Column) -> Column:
    """Nickname-canonical form of a person-name column."""
    return replace_tokens(c, NICKNAMES)


def standardize_address(c: Column) -> Column:
    """Abbreviation-expanded form of an address column."""
    return replace_tokens(c, ADDRESS_ABBREV)
