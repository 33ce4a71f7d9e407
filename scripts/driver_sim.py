#!/usr/bin/env python
"""Simulate the driver's correctness gate: import __spark_entry__,
run entry() smoke, then every queries()[name] at sf0.01 compared
against oracle_sql()[name] via DuckDB (row count + columns + values).

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional further args: subset of query names (iteration aid; the full
# run — no subset — remains the gate)
SUBSET = set(sys.argv[2:])


def main() -> int:
    import __spark_entry__ as e
    from dbt_maxcompute_spark.session import get_spark
    from tests.oracle import compare_to_oracle

    spark = get_spark(app_name="driver_sim")

    df = e.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={df.schema.simpleString()}")
    assert n >= 0

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    if SUBSET:
        qs = {k: v for k, v in qs.items() if k in SUBSET}
    for name in sorted(qs):
        try:
            got = qs[name](spark, SF)
            if name in oracles:
                compare_to_oracle(got, oracles[name], SF)
                print(f"  OK   {name}")
            else:
                rows = got.count()
                print(f"  ROWS {name}: {rows} (no oracle — rows-only check)")
        except Exception as exc:
            failed.append(name)
            msg = str(exc).splitlines()[0][:200]
            print(f"  FAIL {name}: {msg}")
    print(f"{len(qs) - len(failed)}/{len(qs)} queries pass at {SF}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
