"""Pipeline operators: extract, blocking, compare, scoring, cluster, review."""
