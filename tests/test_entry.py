"""Registry-budget and contract checks for __spark_entry__.py.

The driver's correctness harness checks the first DRIVER_QUERY_BUDGET
entries of queries() against oracle_sql() — round 5 showed that letting
the registry outgrow that budget silently evicts previously-green rows.
These tests pin the contract WITHOUT starting Spark (pure dict checks),
so they are cheap enough to run on every pytest invocation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# queries that are deliberately oracle-free (non-SQL-expressible or
# IO/interactive; the driver records a weaker rows-only check for them)
_NO_ORACLE_OK: set[str] = set()


def test_registry_budget():
    qs = entry.queries()
    assert len(qs) <= entry.DRIVER_QUERY_BUDGET, (
        f"queries() has {len(qs)} entries but the driver checks only "
        f"{entry.DRIVER_QUERY_BUDGET} — consolidate near-duplicates into "
        "one row per operator family or move variants to extended_queries()"
    )


def test_every_registered_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = set(qs) - set(oracles) - _NO_ORACLE_OK
    assert not missing, f"queries without an oracle_sql entry: {sorted(missing)}"


def test_no_orphan_oracles():
    qs, oracles = entry.queries(), entry.oracle_sql()
    orphans = set(oracles) - set(qs)
    assert not orphans, f"oracle_sql entries with no query: {sorted(orphans)}"


# iterative / non-SQL-expressible extended entries: rows-only check in
# tools/check_oracles.py, hard check lives in pytest (test_bpe.py)
_EXTENDED_NO_ORACLE_OK = {"bpe_merges", "graph_kcore", "blocking_scheme"}


def test_extended_registries_are_consistent():
    eqs, eoracles = entry.extended_queries(), entry.extended_oracle_sql()
    assert set(eqs) - set(eoracles) == _EXTENDED_NO_ORACLE_OK
    assert not set(eoracles) - set(eqs)
    # extended entries never shadow driver-facing ones
    assert not set(eqs) & set(entry.queries())
    assert not set(eoracles) & set(entry.oracle_sql())
