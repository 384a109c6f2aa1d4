"""Device-memory hygiene helpers for single-chip deployment.

The axon/TPU allocator is a plain best-fit heap with no compaction: a
param tree materialized leaf-at-a-time (eager init, or in-place int8
quantization with ``free_source=True``) interleaves short-lived
temporaries with long-lived param leaves and leaves the heap
checkerboarded. A later program whose temp arena needs a multi-GiB
CONTIGUOUS block then fails with RESOURCE_EXHAUSTED even though total
free HBM is ample (hard-won; see CLAUDE.md "42L bf16 FITS one chip iff
params come from ONE jitted init program").

``compact_params`` re-materializes a whole pytree through ONE jitted
copy program: XLA buffer-assigns the outputs of a single program
compactly, so the returned tree occupies one dense region and the old
(fragmented) buffers can be dropped by the caller simply by releasing
its references. Peak transient cost is 2x the tree's size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def _copy_tree(tree):
    # jnp.copy (not identity): jit of an identity returns the INPUT buffers
    # unchanged, which would defeat the compaction entirely.
    return jax.tree.map(jnp.copy, tree)


def compact_params(params, *, block: bool = True):
    """Defragment a param pytree by copying it through one jitted program.

    Values are bit-identical; dtypes/shardings are preserved. Requires
    transient headroom of one extra copy of the tree (release other big
    references first). ``block=True`` waits for the copy so the caller can
    delete the source tree immediately after.
    """
    out = _copy_tree(params)
    if block:
        out = jax.block_until_ready(out)
    return out
