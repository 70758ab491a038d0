"""Dump the formatted plan of ONE Large-Star + Small-Star CC round.

The registered CC queries execute the star rounds EAGERLY inside
``connected_components`` (per-round localCheckpoint), so their result
plans show only the final label checkpoint leaf — the per-round plan
the r14 window-min rewrite changes is invisible in the query dumps.
This captures it directly: a synthetic edge frame (plan shape is
data-independent) through ``_small_star(_large_star(e))``.

Usage: python plans/r14/dump_cc_round.py <before|after>
Writes plans/r14/cc_star_round_<tag>.txt
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, ROOT)


def main() -> None:
    tag = sys.argv[1]
    from pyspark.sql import functions as F

    from fink_joiner_spark import plans
    from fink_joiner_spark.operators import graph
    from fink_joiner_spark.session import get_spark

    spark = get_spark("cc-round-plan-dump")
    e = spark.range(0, 1000).select(
        F.col("id").alias("u"), ((F.col("id") * 7 + 3) % 997).alias("v")
    ).filter(F.col("u") != F.col("v"))
    rnd = graph._small_star(graph._large_star(e))  # noqa: SLF001
    fp = plans.plan_fingerprint(rnd)
    out = os.path.join(HERE, f"cc_star_round_{tag}.txt")
    with open(out, "w") as fh:
        fh.write(f"== one large+small star CC round ({tag}) ==\n")
        fh.write("(synthetic spark.range edges; plan shape is "
                 "data-independent)\n")
        fh.write(f"fingerprint: {fp}\n\n")
        fh.write("==== STATIC PLAN (pre-AQE) ====\n")
        fh.write(plans.formatted_plan(rnd))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
