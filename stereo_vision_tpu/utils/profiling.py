"""Profiling/observability helpers (SURVEY.md §5 tracing subsystem).

The reference has no profiling beyond tqdm bars (SURVEY.md §5); on TPU,
naive timing is actively misleading (async dispatch undercounts; the
remote tunnel memoizes programs by input value), so this module packages
the two techniques round-1 optimization was done with:

- ``time_jitted``: N runs chained inside ONE jit dispatch, each
  iteration's input perturbed from the previous output — immune to both
  failure modes above. This is the timing rule from bench.py, reusable.
- ``trace``: a ``jax.profiler.trace`` context writing a TensorBoard-
  readable trace directory for per-kernel/per-fusion breakdowns.
- ``StageTimer``: wall-clock per-stage accumulator whose dict plugs into
  ``StageReport.metrics`` (pipeline/stages.py) so CLI runs report
  per-stage milliseconds and Mpx/s.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


def time_jitted(
    fn: Callable,
    args: tuple,
    n: int = 5,
    perturb: Callable | None = None,
    reduce_out: Callable | None = None,
) -> float:
    """Seconds per call of ``fn(*args)``, measured as n chained calls
    inside one jit.

    Args:
      fn: jit-traceable function of ``args``.
      args: example inputs (arrays).
      perturb: ``(args, carry, i) -> args`` hook that must make iteration
        i's input depend on the previous output ``carry`` (a scalar) and
        differ per i. Default: add ``carry + i`` (cast to the array dtype)
        to the first element of the flattened first arg.
      reduce_out: ``out -> scalar`` producing the carry from fn's output.
        Default: take the first leaf's [0, ...0] element cast to f32.
    """
    import jax
    import jax.numpy as jnp

    flat_args, treedef = jax.tree_util.tree_flatten(args)

    def default_perturb(flat, carry, i):
        # Perturb the first non-bool leaf (bool has no meaningful "+bump",
        # and .at[].add on bool is logical-or, which saturates).
        for k, a0 in enumerate(flat):
            if a0.dtype != bool:
                bump = (carry + i).astype(a0.dtype)
                return flat[:k] + [a0.at[(0,) * a0.ndim].add(bump)] + flat[k + 1 :]
        raise ValueError(
            "all inputs are boolean; pass an explicit perturb= hook so each "
            "iteration's input depends on the previous output"
        )

    def default_reduce(out):
        # Use the CENTER element: borders are often constant (e.g. SGBM's
        # invalid margin), and a constant carry lets XLA dead-code-
        # eliminate the entire body (observed: 25 ms SGBM "measured" 5 ms).
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf[tuple(s // 2 for s in leaf.shape)].astype(jnp.float32)

    perturb_flat = perturb or default_perturb
    reduce_fn = reduce_out or default_reduce

    @jax.jit
    def chained(*flat):
        def body(carry, i):
            fl = perturb_flat(list(flat), carry, i)
            out = fn(*jax.tree_util.tree_unflatten(treedef, fl))
            return reduce_fn(out), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n, dtype=jnp.float32))
        return c

    import numpy as np

    _ = np.asarray(chained(*flat_args))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(chained(*flat_args))
    return (time.perf_counter() - t0) / n


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates named wall-clock stage timings.

    >>> t = StageTimer()
    >>> with t("rectify"): ...
    >>> t.metrics  # {"rectify_ms": ...}
    """

    def __init__(self):
        self._ms: dict[str, float] = {}
        self._px: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, pixels: int | None = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._ms[f"{name}_ms"] = self._ms.get(f"{name}_ms", 0.0) + dt * 1e3
            if pixels:
                # Accumulate pixels alongside time so a reused stage name
                # reports throughput over ALL its intervals, not the last.
                self._px[name] = self._px.get(name, 0) + pixels

    @property
    def metrics(self) -> dict[str, float]:
        out = dict(self._ms)
        for name, px in self._px.items():
            out[f"{name}_mpx_per_s"] = px / self._ms[f"{name}_ms"] / 1e3
        return out
