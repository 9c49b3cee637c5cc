"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime, but it cannot help when a hot key's rows must still meet in
one task downstream, or when the join is planned before statistics
exist (first run, streaming micro-batches). Salting is the static
answer: spread each hot key over ``n_salt`` sub-keys on the big side
and replicate the small side's matching rows once per sub-key — the
join result is IDENTICAL, but no task ever holds more than ~1/n_salt
of a hot key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame, small: DataFrame,
    on: Sequence[str], n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted into
    ``n_salt`` sub-keys and the small side exploded once per salt —
    result identical to ``big.join(small, on, how)``, shuffle skew
    bounded by 1/n_salt per key.

    The salt is DETERMINISTIC (xxhash64 of the big side's whole row,
    mod n_salt) — re-runs and retried tasks produce the same
    assignment, unlike a rand()-based salt which breaks task retry
    idempotency (Spark recomputes lost partitions; a random salt
    re-rolls and silently drops/duplicates rows).

    Cost model: small side grows n_salt×. Right-size n_salt to the skew
    (hot-key rows / healthy-partition rows), not to the cluster.
    """
    keys = list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(n_salt)).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, keys + ["__salt"], how).drop("__salt")
