"""Distributed (multi-host) input pipeline helpers.

Replaces the reference's ``SplitData``-over-shared-filesystem model
(SURVEY.md §2.6 P1 / §5.8): each host process loads only its shard of
utterances, builds process-local padded batches, and assembles them into
globally-sharded ``jax.Array``s over the data mesh axis — DCN never sees raw
audio, only the psum'd statistics.

Single-host (including the unit-test virtual mesh) degrades to the identity
sharding, so the same training code runs unchanged from 1 chip to a pod.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def host_shard(items: list, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """Deterministic per-host utterance shard (round-robin over the sorted
    list so shards stay balanced across length distributions)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(sorted(items)) if i % pc == pi]


def pad_to_multiple(batch_arrays: dict, multiple: int, pad_axis: int = 0) -> dict:
    """Pad the leading (utterance) axis to a multiple of the mesh's data size
    with zero rows (weights already mask padding)."""
    out = {}
    for k, v in batch_arrays.items():
        n = v.shape[pad_axis]
        target = -(-n // multiple) * multiple
        if target != n:
            pad = [(0, 0)] * v.ndim
            pad[pad_axis] = (0, target - n)
            v = np.pad(v, pad)
        out[k] = v
    return out


def global_batch(mesh: Mesh, local_arrays: dict) -> dict:
    """Assemble process-local arrays into data-axis-sharded global arrays
    (jax.make_array_from_process_local_data).  With one process this is just
    a device_put with the sharded layout."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    out = {}
    for k, v in local_arrays.items():
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
