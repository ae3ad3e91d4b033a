"""Per-leg profile of dq_expectations_gate at a scaled cell (r10 item 2).

The gate is three independent legs UNIONed: the lineitem conditional-count
scan (li), the orders scan (o), and the FK distinct-key merge join (fk).
This times each leg alone plus the full gate, min-of-2 fresh constructions
in one warm cell-runner-environment session, and the DuckDB walls for the
same legs — so the residual 1000x ratio can be attributed before shaving.

Usage: python tools/dq_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

LI = """
SELECT count(*) AS n,
       count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS v_qty,
       count(*) FILTER (WHERE l_shipdate IS NULL) AS v_ship,
       count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS v_disc
FROM lineitem
"""
O = """
SELECT count(*) AS n,
       count(*) FILTER (WHERE o_totalprice <= 0) AS v_price
FROM orders
"""
FK = """
SELECT /*+ MERGE(orders) */ count(*) AS n,
       count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS v
FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
LEFT JOIN orders ON l_orderkey = o_orderkey
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dfs_scaled/sf10"

    from duckdb_fastlanes_spark import get_spark, registry
    from duckdb_fastlanes_spark.catalog import optimize_layout, sql_q, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    spark = get_spark("dq-profile")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)

    def t_spark(build):
        build().toArrow()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            build().toArrow()
            runs.append(round(time.perf_counter() - t0, 3))
        return min(runs)

    full_fn = registry.queries()["dq_expectations_gate"]
    out = {
        "li": t_spark(lambda: sql_q(spark, sf_dir, LI)),
        "o": t_spark(lambda: sql_q(spark, sf_dir, O)),
        "fk": t_spark(lambda: sql_q(spark, sf_dir, FK)),
        "full": t_spark(lambda: full_fn(spark, sf_dir)),
    }

    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    def t_duck(sql):
        con.execute(sql).fetchall()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(round(time.perf_counter() - t0, 3))
        return min(runs)

    out_d = {
        "li": t_duck(LI),
        "o": t_duck(O),
        "fk": t_duck(FK),
        "full": t_duck(registry.oracles()["dq_expectations_gate"]),
    }
    print(json.dumps({"sf_dir": sf_dir, "spark": out, "duck": out_d}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
