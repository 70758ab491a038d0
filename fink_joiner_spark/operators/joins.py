"""Join operators (SURVEY.md §2.4).

The reference's centerpiece is an 11-way LEFT OUTER equi-join fanning a
fact (listings) out against repeatedly-aliased dimensions
(``leftJoinQuery2``, ``CRMLSJoiner.scala:471-488``). In Spark that is a
chain of ``df.join(..., "left")`` — Catalyst plans each edge as
broadcast-hash or sort-merge independently, and AQE re-plans at runtime.

Scale design:
* dimension snapshots (deduped latest-version tables) are the small
  side → mark genuinely-small ones ``broadcast()`` so an 11-join chain
  costs ONE shuffle of the fact instead of eleven;
* repeated roles of the same dimension (agents ×4, offices ×4 — J5)
  reuse a single deduped DataFrame under different aliases, so it is
  computed (and broadcast) once;
* the fact side keeps its partitioning across the chain — no
  intermediate repartition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def multiway_left_join(
    fact: DataFrame,
    joins: Sequence[tuple[DataFrame, Column, str | None]],
) -> DataFrame:
    """J1 — chain LEFT OUTER equi-joins.

    ``joins`` is a sequence of ``(dim, on_condition, alias)``; when
    ``alias`` is set the dimension is aliased (J5 self-join roles).
    Pass pre-broadcast dimensions (``F.broadcast(dim)``) for small
    sides; Catalyst/AQE decides for the rest.
    """
    out = fact
    for dim, cond, alias in joins:
        out = out.join(dim.alias(alias) if alias else dim, cond, "left")
    return out


def aliased_roles(dim: DataFrame, aliases: Sequence[str]) -> dict[str, DataFrame]:
    """J5 — one deduped dimension reused under several FK roles
    (agents aa/ab/ac/ad, ``CRMLSJoiner.scala:475-478``)."""
    return {a: dim.alias(a) for a in aliases}
