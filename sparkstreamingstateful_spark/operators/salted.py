"""Salted replicate join building blocks — the explicit skew-distribution
pattern for hot keys (used by ``agg_salted_skew``; the pairwise-similarity
family that originally motivated it — dedup_near, dedup_ngram_jaccard,
embed_near_dup, embed_pairwise_label — was re-scoped in r2–r4 to prefix
filtering / LSH / broadcast-probe shapes that need no salting; the r1
measurements below are kept as the recipe for when a salted replicate
join IS the right tool, e.g. a skewed fact-fact join).

Shape: the probe (left) side gets a deterministic hash salt in [0, parts);
the build (right) side is replicated ``parts``× via an in-row explode; the
join key gains ``salt`` equality. Per-task work becomes block²/parts and
per-task memory one salt-slice — bounded at any corpus size, with no
corpus-sized broadcast and no single-task low-cardinality block. Join with
``.hint("merge")``: the shuffle IS the distribution (without it Catalyst
broadcasts the replicated side and the probe side keeps its scan
partitioning — measured 79 s vs 16 s at sf0.1).

Both helpers produce IntegerType salts — the equi-join's type-matching
invariant lives here, in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_col: str, parts: int, *, col: str = "_salt") -> DataFrame:
    """Probe side: deterministic hash salt in [0, parts)."""
    return df.withColumn(col, F.pmod(F.xxhash64(id_col), F.lit(parts)).cast("int"))


def replicated(df: DataFrame, parts: int, *, col: str = "_salt") -> DataFrame:
    """Build side: replicate every row across all salts (in-row explode —
    no driver involvement, stays in the scan stage)."""
    return df.withColumn(
        col, F.explode(F.array(*[F.lit(i).cast("int") for i in range(parts)]))
    )
