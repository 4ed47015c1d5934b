"""Profiling / tracing hooks.

The reference's only observability is tqdm bars (SURVEY.md §5).  The TPU
equivalents: `jax.profiler` traces around the scan and per-step wall-clock
accounting.  Usage:

    with trace("/tmp/tb"):              # open in TensorBoard / xprof
        final, frames = guided_sample(...)

    with annotate("guided_step"):       # named region in the trace
        ...
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when a log dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows in xprof timelines)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def clear_device_cache() -> None:
    """Release host+device memory that is no longer referenced (reference
    `clear_gpu_cache`, functional.py:137-140: gc + torch.cuda.empty_cache).

    The JAX analog: collect Python garbage so dead jax.Arrays drop their
    device buffers (XLA frees them immediately — there is no allocator
    cache to flush on TPU), then drop the tracing/compilation caches,
    which on a remote-attached backend also releases the host-side
    serialized executables.  Live arrays (model params etc.) are
    untouched, same as the reference."""
    import gc

    import jax

    gc.collect()
    jax.clear_caches()


class Stopwatch:
    """Wall-clock section accounting; `report()` returns a JSON-able dict."""

    def __init__(self):
        self.sections: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + (
                time.time() - t0
            )

    def report(self) -> str:
        return json.dumps(
            {k: round(v, 4) for k, v in self.sections.items()}
        )
