"""Query suite: every operator from SURVEY.md §2 as a (spark, sf_dir) ->
DataFrame callable plus a DuckDB oracle SQL string.

Aggregated by ``__spark_entry__.py`` into the driver contract
(``queries()`` / ``oracle_sql()``).

Numeric determinism convention (so Spark and DuckDB value-hashes
match): sums over doubles are computed as
``CAST(SUM(CAST(expr AS DECIMAL(28,6))) AS DOUBLE)`` — the double
expression is IEEE-deterministic, the decimal sum is order-independent
and exact, the final double cast is well-defined. Plain double SUMs
are order-dependent at the last bit and would flake the hash compare.
"""

from __future__ import annotations
