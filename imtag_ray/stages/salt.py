"""Explicit salted aggregation for skewed keys (SURVEY.md §4.1 'Skew';
north_rule: 'skewed hub vertices are split via salted keys before
shuffle').

Two complementary skew treatments exist in this engine:

1. **Combiner-as-salt** (the default, used by every iterative round):
   per-batch partial aggregation inside ``map_batches`` means a hot key
   ships at most one row per block — salt = block id. Zero config.
2. **Explicit key salting** (this module): for shuffle-mode aggregations
   where the combiner can't run first (e.g. join outputs too wide to
   pre-reduce), a hot key k is split into (k, salt) sub-keys with
   ``salt = hash(row) % n_salts``, aggregated partially per sub-key,
   then finalized with a second, skew-free groupby over at most
   ``n_salts`` rows per key.

Salting is only sound for algebraic (commutative/associative)
aggregates — sum/min/max/count — which is asserted by the algebra test
(tests/test_salt.py): salted and unsalted results are identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..util import col_np, table_from_arrays

_AGGS = {"sum": Sum, "min": Min, "max": Max}
_NP_REDUCE = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def salted_aggregate(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    agg: str = "sum",
    n_salts: int = 16,
    hot_keys: "np.ndarray | None" = None,
) -> "ray.data.Dataset":
    """groupby(key).agg(value) with hot keys salted into ``n_salts``
    sub-keys. When ``hot_keys`` is given (e.g. from a degree table),
    only those keys are salted (cold keys keep salt 0 and skip the
    second shuffle's fan-in); otherwise every key is salted.

    → Dataset (key_col, value_col).
    """
    if agg not in _AGGS:
        raise ValueError(f"salting requires an algebraic aggregate, got {agg}")
    import ray

    hot_ref = ray.put(np.sort(hot_keys) if hot_keys is not None else None)

    def add_salt(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        keys = col_np(batch, key_col)
        # deterministic pseudo-random salt from row position + key
        salt = (
            np.arange(len(keys), dtype=np.int64) * 2654435761 + keys
        ) % n_salts
        if hot is not None:
            pos = np.searchsorted(hot, keys)
            pos[pos >= len(hot)] = max(len(hot) - 1, 0)
            is_hot = (hot[pos] == keys) if len(hot) else np.zeros(len(keys), bool)
            salt = np.where(is_hot, salt, 0)
        return table_from_arrays(
            **{key_col: keys, "salt": salt, value_col: col_np(batch, value_col)}
        )

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key_col, "salt"])
        .aggregate(_AGGS[agg](value_col, alias_name=value_col))
    )
    final = (
        partial.groupby(key_col)
        .aggregate(_AGGS[agg](value_col, alias_name=value_col))
    )
    return final.select_columns([key_col, value_col])
