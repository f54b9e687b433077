"""Local replica of the driver's DuckDB oracle check.

Runs every queries() entry at the given sf_dir, runs the matching
oracle_sql() through DuckDB over the same parquet, and compares
row count, column names/types, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for row in canon:
        h.update(("\x1f".join(row) + "\x1e").encode("utf-8"))
    return h.hexdigest()


def _norm(v) -> str:
    try:
        if v is None or v != v:  # None, float NaN, pandas NaT (toPandas
            # maps a NULL timestamp to NaT, which would stringify as
            # 'NaT' and spuriously mismatch DuckDB's None)
            return "<NULL>"
    except (TypeError, ValueError):  # non-scalar v; fall through to str
        pass
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from rlr_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # full registry: the driver's 50-row budget PLUS the extended
    # entries (retired near-duplicate variants) — this tool is the
    # correctness record for the extended set
    qs = {**entrymod.queries(), **entrymod.extended_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.extended_oracle_sql()}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_pdf = sdf.toPandas()  # Arrow path — py4j collect() is 100x slower
            s_rows = list(s_pdf.itertuples(index=False, name=None))
            s_cols = list(s_pdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(s_rows)} (no oracle, rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            hs = value_hash(s_rows, list(s_cols))
            hd = value_hash(d_rows, list(d_cols))
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a diff sample
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                cs = sorted(tuple(_norm(r[i]) for i in order_s) for r in s_rows)
                cd = sorted(tuple(_norm(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(cs, cd):
                    if a != b:
                        problems.append(f"  first diff:\n   spark : {a}\n   duckdb: {b}")
                        break
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"ok    {name}: rows={len(s_rows)}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
