"""Ordered-sequence operators (SURVEY §2.5 W2/W3 relational forms).

REx's span pairing (rex/utils/span.py:8-52: each head start pairs with
the nearest tail at-or-after it) is a per-row array kernel
(kernels/spans.py); this module provides the RELATIONAL form of the
same "nearest following" semantics over event sequences — an as-of
pairing built on a reverse-running-min window, O(n log n) in the sort
and one shuffle on the partition key, with no self-join (the naive
head x tail join is quadratic on hot keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_next(
    df: DataFrame,
    partition_keys: list[str],
    order_cols: list[str],
    head_pred: Column,
    tail_pred: Column,
) -> DataFrame:
    """For every head row, the nearest tail value at-or-after it.

    Returns the head rows plus ``next_tail`` (min of the first order
    column among tail rows at-or-after the head in the same partition
    group; null when no tail follows).  ``order_cols`` must be a
    deterministic total order (include a tiebreaker) or frame
    membership is ambiguous under ties.  W2 semantics, minus the
    reference's leftover-tail backtrace (that variant is per-row:
    kernels/spans.find_closest_span_pairs).
    """
    w = (
        Window.partitionBy(*partition_keys)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    tail_val = F.when(tail_pred, F.col(order_cols[0]))
    return (
        df.withColumn("_next_tail", F.min(tail_val).over(w))
        .where(head_pred)
        .withColumnRenamed("_next_tail", "next_tail")
    )
