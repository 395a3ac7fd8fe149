"""Static-shape sparse utilities for embedding training on TPU.

XLA requires static shapes, so the reference's dynamic ``Unique`` op
(``mindspore_rec/ops/embedding.py:189-193``: reshape -> Unique ->
MapTensorGet -> Gather) is re-designed here as *padded unique*: the
unique-id buffer has the static worst-case size (``batch * field``)
and unused slots are filled with a sentinel id pointing at a dummy
table row.  Gradients for the padded slots are exactly zero (they are
never gathered from), and row-sparse optimizer updates on the sentinel
row are harmless because real lookups never read it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class UniqueResult(NamedTuple):
    """Result of :func:`unique_pad`.

    Attributes:
      ids: ``[size]`` unique ids, padded with ``fill_value``.
      inverse: ``[n]`` index into ``ids`` for each input element.
      count: scalar int32, number of real unique ids.
    """

    ids: jnp.ndarray
    inverse: jnp.ndarray
    count: jnp.ndarray


def unique_pad(ids: jnp.ndarray, size: int, fill_value: int) -> UniqueResult:
    """jit-safe unique with a static output size.

    ``fill_value`` should be the index of a dummy row (e.g. ``vocab_size``
    for a table allocated with ``vocab_size + 1`` rows).
    """
    flat = ids.reshape(-1)
    uniq, inverse, counts = jnp.unique(
        flat,
        size=size,
        fill_value=fill_value,
        return_inverse=True,
        return_counts=True,
    )
    n_unique = jnp.sum((counts > 0).astype(jnp.int32))
    return UniqueResult(uniq, inverse.reshape(ids.shape), n_unique)


def segment_sum_rows(
    values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Sum ``values`` rows into ``num_segments`` buckets (static count).

    Used to combine duplicate-id gradients into per-unique-row gradients,
    mirroring the reference's IndexedSlices-gradient combine done inside
    MindSpore's sparse optimizers.
    """
    return jax.ops.segment_sum(
        values, segment_ids.reshape(-1), num_segments=num_segments
    )
