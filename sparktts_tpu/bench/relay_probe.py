"""Relay/dispatch health probe: measure the platform's fixed per-program and
per-round-trip costs so every benchmark artifact carries the *window* it was
recorded in as data, not prose.

On this environment the TPU is reached through a tunneled relay whose
per-dispatch overhead drifts hour-to-hour (18 ms -> 150+ ms observed across
one day, NOTES_ROUND4.md).  A win/loss cell against the reference is only
interpretable alongside the tax that was in effect while it was measured —
the reference's analogue is the per-run Triton stats dump it saves next to
every benchmark (`runtime/triton_trtllm/client_grpc.py:89-143,793-808`).

Two numbers are measured with a pre-compiled null-sized program:

* ``roundtrip_ms`` — dispatch one tiny program and block on its result:
  the full enqueue -> execute -> fetch cycle (what a blocking fetch costs).
* ``pipelined_ms`` — enqueue ``depth`` tiny programs back-to-back, block
  once at the end: the marginal cost of an *enqueued* program when the host
  does not sync between dispatches (what chained device work costs).

Both are medians over ``n`` trials; the spread (p10/p90) is kept so a probe
taken in a turbulent window is visibly turbulent.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np


def _null_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x + 1

    return f


def measure_dispatch_tax(
    n: int = 7, depth: int = 8, fn=None, warmup: int = 2
) -> Dict[str, Any]:
    """Measure the platform's fixed dispatch costs with a null-sized program.

    Returns a dict with ``roundtrip_ms`` (median enqueue+execute+fetch),
    ``pipelined_ms`` (marginal cost of one enqueued program inside a chain
    of `depth`, no intermediate sync) and spread percentiles.  Compiles the
    probe program before timing, so the first call is safe inside a bench.
    """
    import jax

    f = fn if fn is not None else _null_fn()
    x = np.zeros((8,), np.float32)
    for _ in range(max(warmup, 1)):  # compile + settle
        np.asarray(f(x))

    rtts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        rtts.append((time.perf_counter() - t0) * 1e3)

    chains = []
    for _ in range(n):
        t0 = time.perf_counter()
        y = f(x)
        for _ in range(depth - 1):
            y = f(y)
        np.asarray(y)
        chains.append((time.perf_counter() - t0) * 1e3)

    rtts_a = np.asarray(rtts)
    chains_a = np.asarray(chains)
    rtt = float(np.median(rtts_a))
    # marginal per-program cost once the first program's round trip is paid
    pipelined = float(max(np.median(chains_a) - rtt, 0.0) / max(depth - 1, 1))
    return {
        "roundtrip_ms": round(rtt, 3),
        "roundtrip_p10_ms": round(float(np.percentile(rtts_a, 10)), 3),
        "roundtrip_p90_ms": round(float(np.percentile(rtts_a, 90)), 3),
        "pipelined_ms": round(pipelined, 3),
        "chain_depth": depth,
        "n": n,
        "unix_time": time.time(),
    }


def probe_record(label: str = "", **kw) -> Dict[str, Any]:
    """measure_dispatch_tax wrapped for artifact embedding: never raises
    (a failed probe records its error instead of killing the bench run
    after the measurement work is already done)."""
    try:
        rec = measure_dispatch_tax(**kw)
    except Exception as e:  # pragma: no cover - only on broken devices
        rec = {"error": repr(e), "unix_time": time.time()}
    if label:
        rec["label"] = label
    return rec


def bracket(run, label_before: str = "before", label_after: str = "after",
            **kw) -> Dict[str, Any]:
    """Run ``run()`` with a probe before and after; returns
    {"before": ..., "after": ..., "result": run()'s value}.  The two probes
    bound the relay health across the timed region."""
    rec: Dict[str, Any] = {"before": probe_record(label_before, **kw)}
    rec["result"] = run()
    rec["after"] = probe_record(label_after, **kw)
    return rec
