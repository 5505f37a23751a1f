"""Reliable kernel timing on the axon TPU backend.

Two failure modes make naive timing lie here (all observed on this
tunnel):

  1. ``jax.block_until_ready`` can return BEFORE the remote computation
     finishes (async dispatch through the tunnel): a 28 ms program
     "measures" 0.07 ms.  Only a forced host transfer (``np.asarray``)
     is a true barrier.
  2. Identical repeated executions can be served from backend caches
     (CLAUDE.md quirk), and XLA hoists loop-invariant stage calls out of
     a ``lax.scan`` whose per-iteration perturbation simplifies away
     (``x + c*1e-30`` is an exact f32 no-op), silently collapsing REPS
     iterations into one.

``stage_time`` defeats all three: REPS scan iterations chained through a
DATA-DEPENDENT carry perturbation that changes real f32 bits, an
order-sensitive consumption (position-weighted sum, so sorts cannot be
algebraically deleted), fresh host-generated inputs per outer call, and
an ``np.asarray`` barrier on the result.  Reported time =
(best_total - tunnel_floor) / REPS.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

_floor_ms = [None]


def _consume(out):
    """Order-sensitive O(1)-ish scalar from arbitrary outputs."""
    s = jnp.float32(0.0)
    for leaf in jax.tree.leaves(out):
        x = leaf.astype(jnp.float32).reshape(-1)
        w = jnp.arange(x.shape[0], dtype=jnp.float32) / (x.shape[0] + 1.0)
        s = s + jnp.sum(x * w) / (x.shape[0] + 1.0)
    return s


def tunnel_floor(calls: int = 6) -> float:
    """Round-trip ms of a trivial program with a host-transfer barrier."""
    if _floor_ms[0] is not None:
        return _floor_ms[0]
    fn = jax.jit(lambda x: jnp.sum(x))
    np.asarray(fn(jnp.ones((8, 128))))
    best = np.inf
    for i in range(calls):
        x = jnp.full((8, 128), 1.0 + 0.25 * i, jnp.float32)
        np.asarray(x)
        t0 = time.perf_counter()
        np.asarray(fn(x))
        best = min(best, time.perf_counter() - t0)
    _floor_ms[0] = best * 1e3
    return _floor_ms[0]


def stage_time(stage, make_args, label: str = "", reps: int = 8,
               calls: int = 3, verbose: bool = True) -> float:
    """Time ``stage(eps, *args)`` per-execution ms.

    ``stage`` must apply ``eps`` (a small traced f32, |eps| <= 1e-4) to
    its inputs in a way that changes real bits (multiply or add at a
    magnitude above one ulp of the data).  ``make_args`` returns a fresh
    args tuple per outer call.
    """
    floor = tunnel_floor()

    def scanned(c0, args):
        def body(carry, _):
            out = stage(carry, *args)
            s = _consume(out)
            # data-dependent, unpredictable, ~1e-5 magnitude
            new_c = (s - jnp.floor(s)) * 1e-5 + 1e-6
            return new_c, None
        c_fin, _ = jax.lax.scan(body, c0, None, length=reps)
        return c_fin

    fn = jax.jit(scanned)
    np.asarray(fn(jnp.float32(1e-5), make_args()))      # compile
    best = np.inf
    for i in range(calls):
        args = make_args()
        jax.tree.map(np.asarray, args)                  # settle transfers
        c0 = jnp.float32(1e-5 * (1.0 + 0.1 * i))
        t0 = time.perf_counter()
        np.asarray(fn(c0, args))
        best = min(best, time.perf_counter() - t0)
    ms = max(best * 1e3 - floor, 0.0) / reps
    if verbose:
        print(f"{label:36s}{ms:8.3f} ms", flush=True)
    return ms
