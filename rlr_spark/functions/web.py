"""Web-corpus column functions: URL canonicalization.

URL-level exact dedup is the first pass of every web-crawl pipeline: the
same page is crawled as ``http://WWW.Site.com/a/?utm_source=x`` and
``https://site.com/a``. ``canonical_url`` folds the standard equivalence
classes with PURE column expressions (whole-stage codegen, no UDF), each
rule mirrored 1:1 in ANSI SQL for the DuckDB oracle:

- scheme and host lowercased; ``www.`` prefix dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment (``#...``) dropped
- tracking params (``utm_*``, ``gclid``, ``fbclid``, ``ref``) dropped;
  surviving query params SORTED (param order never changes the page)
- trailing slashes on the path stripped

Assumes absolute http(s) URLs (a crawl frontier's normal form);
protocol-relative or relative inputs pass through mostly unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: params that never change page identity (anchored match on "name=")
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)="


def canonical_url(url: Column) -> Column:
    u = F.trim(F.coalesce(url, F.lit("")))
    u = F.substring_index(u, "#", 1)  # strip fragment

    base = F.substring_index(u, "?", 1)
    qpos = F.instr(u, "?")
    query = F.when(qpos > 0, F.substring(u, qpos + 1, 1 << 20)).otherwise(F.lit(""))

    has_scheme = F.instr(base, "://") > 0
    scheme = F.when(has_scheme, F.lower(F.substring_index(base, "://", 1))).otherwise(
        F.lit("")
    )
    rest = F.when(
        has_scheme,
        F.substring(base, F.length(F.substring_index(base, "://", 1)) + 4, 1 << 20),
    ).otherwise(base)

    hostport = F.lower(F.substring_index(rest, "/", 1))
    path = F.substring(rest, F.length(hostport) + 1, 1 << 20)

    host = F.when(
        hostport.startswith("www."), F.substring(hostport, 5, 1 << 20)
    ).otherwise(hostport)
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.substring(host, 1, F.length(host) - 3),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.substring(host, 1, F.length(host) - 4),
    ).otherwise(host)

    path = F.regexp_replace(path, r"/+$", "")

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")

    out = F.concat(
        F.when(has_scheme, F.concat(scheme, F.lit("://"))).otherwise(F.lit("")),
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
    return out


def canonical_url_sql(col: str) -> str:
    """The DuckDB-equivalent expression for :func:`canonical_url`."""
    u = f"split_part(trim(coalesce({col}, '')), '#', 1)"
    base = f"split_part({u}, '?', 1)"
    query = (
        f"CASE WHEN strpos({u}, '?') > 0 "
        f"THEN substr({u}, strpos({u}, '?') + 1) ELSE '' END"
    )
    has_scheme = f"strpos({base}, '://') > 0"
    scheme = f"CASE WHEN {has_scheme} THEN lower(split_part({base}, '://', 1)) ELSE '' END"
    rest = (
        f"CASE WHEN {has_scheme} "
        f"THEN substr({base}, length(split_part({base}, '://', 1)) + 4) "
        f"ELSE {base} END"
    )
    hostport = f"lower(split_part({rest}, '/', 1))"
    path = f"regexp_replace(substr({rest}, length({hostport}) + 1), '/+$', '')"
    host0 = (
        f"CASE WHEN starts_with({hostport}, 'www.') "
        f"THEN substr({hostport}, 5) ELSE {hostport} END"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' AND {host0} LIKE '%:80' "
        f"THEN substr({host0}, 1, length({host0}) - 3) "
        f"WHEN {scheme} = 'https' AND {host0} LIKE '%:443' "
        f"THEN substr({host0}, 1, length({host0}) - 4) "
        f"ELSE {host0} END"
    )
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))"
    )
    # array_to_string of an EMPTY list is NULL in DuckDB ('' in Spark)
    qnorm = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    return (
        f"(CASE WHEN {has_scheme} THEN {scheme} || '://' ELSE '' END) "
        f"|| {host} || {path} "
        f"|| (CASE WHEN {qnorm} = '' THEN '' ELSE '?' || {qnorm} END)"
    )
