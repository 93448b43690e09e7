"""jax.profiler integration: Perfetto/XProf traces for kernel inspection.

The reference's only profiling story is external nvprof screenshots
(README.md:50-71).  Here: programmatic trace capture around any pipeline
call, viewable in Perfetto / TensorBoard.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(out_dir: str = "/tmp/canny_tpu_trace"):
    """Capture a device trace for the enclosed block.

    with trace("/tmp/t"):
        model(img, 50, 150).block_until_ready()
    """
    import jax

    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    try:
        yield out_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
