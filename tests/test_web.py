"""URL canonicalization + PII scan: folding rules, SQL-expression parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from rlr_spark.functions.web import canonical_url, canonical_url_sql

VARIANTS = [
    # all of these are the same page
    "http://www.Shop.com/a/b/?utm_source=x&q=1&a=2",
    "HTTP://SHOP.COM:80/a/b?a=2&q=1",
    "http://shop.com/a/b/?q=1&a=2#section-3",
    "http://www.shop.com:80/a/b?utm_campaign=y&fbclid=z&a=2&q=1",
]
DISTINCT = [
    "https://shop.com/a/b?a=2&q=1",   # scheme differs
    "http://shop.com/a/b?a=2&q=2",    # param value differs
    "http://shop.com/a/c?a=2&q=1",    # path differs
    "http://shop.org/a/b?a=2&q=1",    # host differs
]


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]


def test_variants_fold_to_one_canonical(spark):
    got = set(_canon(spark, VARIANTS))
    assert got == {"http://shop.com/a/b?a=2&q=1"}


def test_distinct_pages_stay_distinct(spark):
    canon = _canon(spark, VARIANTS + DISTINCT)
    assert len(set(canon)) == 1 + len(DISTINCT)


def test_canonical_url_sql_parity(spark):
    urls = VARIANTS + DISTINCT + [
        "", "no-scheme.com/x?utm_source=a", "https://host:443/p/",
    ]
    got = _canon(spark, urls)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (raw_url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('raw_url')} FROM t"
        ).fetchall()
    ]
    assert got == want


def test_pii_counts_and_redact(spark):
    from rlr_spark.functions.text import pii_counts, pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c%x@foo-bar.co.uk or x@y.io, call +1 555-123-4567"),
            (2, "server at 192.168.0.1 and 10.0.0.255"),
            (3, "clean text only"),
            (4, "bare form 555-123-4567 works too"),
        ],
        "id long, text string",
    )
    p = pii_counts(F.col("text"))
    rows = {
        r.id: r
        for r in df.select(
            "id",
            *[c.alias(n) for n, c in p.items()],
            pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert rows[1].n_emails == 2 and rows[1].n_phones == 1 and rows[1].has_pii
    assert rows[1].red == "mail [EMAIL] or [EMAIL], call [PHONE]"
    assert rows[2].n_ipv4 == 2 and rows[2].red == "server at [IP] and [IP]"
    assert rows[3].has_pii is False and rows[3].red == "clean text only"
    # country code optional: the bare NANP form counts and redacts
    assert rows[4].n_phones == 1 and rows[4].red == "bare form [PHONE] works too"
