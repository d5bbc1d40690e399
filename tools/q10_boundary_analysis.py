#!/usr/bin/env python
"""q10 money-rounding analysis (VERDICT r5 'What's wrong #1').

The oracle SQL is FROZEN this round, so the only admissible fix is making
the SPARK side reproduce what DuckDB's frozen `ROUND(SUM(double),2)`
actually emits on the driver's datasets. This script uses DuckDB alone to:

  1. run the frozen oracle per SF;
  2. recompute each q10 group's revenue as the EXACT DECIMAL(28,4) sum
     (l_extendedprice and l_discount are 2-dp values, so the product is an
     exact 4-dp decimal and the sum is exact);
  3. flag boundary groups (exact sum ending in .xx5 — where double
     summation order decides the rounding) and report, for each, what
     rounding the nearest-double of the exact sum produces vs what the
     frozen oracle's double-sum produced.

If `round(double(exact_sum), 2)` == oracle output for every group at every
SF, then a Spark plan that aggregates exact decimal cents and rounds once
at the end will hash-match the frozen oracle deterministically (no
summation-order luck), which is the fix applied in plans/catalog.py.
"""

from __future__ import annotations

import sys

import duckdb

SFS = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1"]

Q10_GROUPS = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue_oracle,
       -- exact decimal: product of two exact 2-dp decimals summed exactly
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS cents4,
       COUNT(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_oracle DESC, c_custkey ASC
LIMIT 20
"""


def spark_round_half_up(x: float, nd: int = 2) -> float:
    """Spark's Round(DoubleType): BigDecimal.valueOf(double) (shortest
    decimal repr) then setScale(HALF_UP) — replicated via repr()."""
    from decimal import Decimal, ROUND_HALF_UP

    return float(Decimal(repr(x)).quantize(Decimal("0.01"), ROUND_HALF_UP))


def main():
    for sf in SFS:
        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem", "nation"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        rows = con.execute(Q10_GROUPS).fetchall()
        n_bound = n_mismatch = 0
        print(f"== {sf}: {len(rows)} q10 groups")
        for ck, name, nn, rev_oracle, cents4, n in rows:
            cents4 = int(cents4)
            exact = cents4 / 10000  # nearest double of the exact 4-dp sum
            # candidate Spark plan value: round(double(exact_decimal), 2)
            spark_val = spark_round_half_up(exact)
            boundary = cents4 % 1000 == 500  # exact sum ends in .x500
            if boundary:
                n_bound += 1
            if abs(spark_val - float(rev_oracle)) > 1e-9:
                n_mismatch += 1
                print(f"  MISMATCH cust {ck}: oracle {rev_oracle} "
                      f"spark-decimal {spark_val} exact {cents4}e-4 "
                      f"boundary={boundary}")
        print(f"   boundary groups: {n_bound}, "
              f"decimal-plan mismatches vs oracle: {n_mismatch}")
        con.close()


if __name__ == "__main__":
    main()
