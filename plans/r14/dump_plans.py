"""Dump static + AQE-final formatted plans for named queries.

Usage: python plans/r14/dump_plans.py <before|after> <query> [...]
Writes plans/r14/<query>_<tag>.txt (same format as plans/r13).
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from fink_joiner_spark import plans
    from fink_joiner_spark.operators import graph
    from fink_joiner_spark.queries import queries
    from fink_joiner_spark.session import get_spark

    spark = get_spark("plan-dump")
    fns = queries()
    unknown = [n for n in names if n not in fns]
    assert not unknown, f"unknown queries: {unknown}"
    for name in names:
        t0 = time.perf_counter()
        df = fns[name](spark, SF_DIR)
        t1 = time.perf_counter()
        static = plans.formatted_plan(df)
        fp = plans.plan_fingerprint(df)
        t2 = time.perf_counter()
        final = plans.formatted_plan(df, final=True)
        t3 = time.perf_counter()
        out = os.path.join(HERE, f"{name}_{tag}.txt")
        with open(out, "w") as fh:
            fh.write(f"== {name} ({tag}) sf_dir={SF_DIR} ==\n")
            fh.write(f"fingerprint: {fp}\n")
            fh.write(
                f"build_s={t1 - t0:.2f} collect_exec_s={t3 - t2:.2f} "
                "(load-dependent; bench numbers are authoritative)\n\n"
            )
            fh.write("==== STATIC PLAN (pre-AQE) ====\n")
            fh.write(static)
            fh.write("\n\n==== FINAL PLAN (post-AQE, after collect) ====\n")
            fh.write(final)
        graph.free_checkpoints()
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
