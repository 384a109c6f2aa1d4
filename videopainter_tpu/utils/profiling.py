"""Profiling / tracing utilities.

The reference has no profiler (SURVEY.md §5 — tqdm only); the TPU rebuild gets
jax.profiler + Perfetto for free. Wrap the denoise scan (or any region) with
`profile_region("denoise", out_dir)` or gate with `--profile` via
`maybe_profile(enabled, ...)`; open the trace in Perfetto / TensorBoard.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional


@contextlib.contextmanager
def profile_region(name: str, out_dir: str = "/tmp/jax_trace",
                   create_perfetto_link: bool = False):
    import jax

    path = os.path.join(out_dir, name)
    os.makedirs(path, exist_ok=True)
    jax.profiler.start_trace(path, create_perfetto_link=create_perfetto_link)
    t0 = time.time()
    try:
        yield path
    finally:
        jax.profiler.stop_trace()
        print(f"[profile] {name}: {time.time() - t0:.2f}s -> {path}")


@contextlib.contextmanager
def maybe_profile(enabled: bool, name: str = "region",
                  out_dir: str = "/tmp/jax_trace"):
    if not enabled:
        yield None
        return
    with profile_region(name, out_dir) as p:
        yield p


def annotate(name: str):
    """Named region inside jitted code (shows up in the XLA trace)."""
    import jax

    return jax.named_scope(name)
