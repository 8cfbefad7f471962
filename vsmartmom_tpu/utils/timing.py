"""Per-stage timing instrumentation (reference TimerOutputs equivalent).

The reference wraps every solver stage in ``TimerOutputs.@timeit`` and dumps
a table when ``numerics.verbose`` is set (rt_run.jl:294-528, print_timer at
l.528). Under XLA the jitted solve is one fused program, so the equivalent
here is two-level:

* HOST stages (model build: profile, absorption, Mie, Z matrices; solve
  dispatch; postprocess copies) are timed with the ``stage`` context
  manager into a global registry; ``report()`` prints the table.
* DEVICE stages inside jit are annotated with ``jax.named_scope`` (see
  core/solver.py) — they label the ops in a ``jax.profiler`` trace
  (scripts/profile_stages.py parses one into an op-level table).

Enable with ``Parameters(verbose=True)`` or VSM_TIMING=1; rt_run prints
the table after each run when enabled.
"""

import os
import time
from collections import OrderedDict
from contextlib import contextmanager

_REGISTRY: "OrderedDict[str, list]" = OrderedDict()
_STACK: list = []


def enabled() -> bool:
    return bool(os.environ.get("VSM_TIMING"))


def reset() -> None:
    _REGISTRY.clear()


@contextmanager
def stage(name: str, sync=None):
    """Time a host-side stage. ``sync`` (optional) is called on exit before
    the clock stops — pass ``jax.block_until_ready`` bound to the stage's
    output to charge device time to the right stage."""
    _STACK.append(name)
    full = "/".join(_STACK)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            sync()
        _REGISTRY.setdefault(full, []).append(time.perf_counter() - t0)
        _STACK.pop()


def record(name: str, seconds: float) -> None:
    _REGISTRY.setdefault(name, []).append(seconds)


def report(min_ms: float = 0.01) -> str:
    """Render the timing table (reference print_timer format: stage,
    ncalls, total time, share)."""
    if not _REGISTRY:
        return "(no stages recorded)"
    total = sum(sum(v) for k, v in _REGISTRY.items() if "/" not in k)
    lines = [f"{'stage':<42s} {'ncalls':>6s} {'time':>10s} {'%tot':>6s}",
             "-" * 68]
    for name, vals in _REGISTRY.items():
        t = sum(vals)
        if t * 1e3 < min_ms:
            continue
        indent = "  " * name.count("/")
        short = indent + name.rsplit("/", 1)[-1]
        share = 100.0 * t / total if total else 0.0
        lines.append(f"{short:<42s} {len(vals):>6d} {t*1e3:>8.1f}ms "
                     f"{share:>5.1f}%")
    lines.append("-" * 68)
    lines.append(f"{'total (top-level)':<42s} {'':>6s} {total*1e3:>8.1f}ms")
    return "\n".join(lines)
