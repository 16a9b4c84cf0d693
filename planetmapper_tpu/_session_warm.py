"""
Background TPU session warm-up.

The first data-dependent fetch after real device work in a process pays
a one-time transport/device session initialisation - measured 10-130 s
through the benchmark environment's remote-TPU tunnel, and entirely
independent of which program runs (a 128-element reduction pays the
same as the 26-plane kernel). A daemon thread started at first
:class:`~planetmapper_tpu.SpiceBase` construction runs exactly that
tiny program, so the init overlaps scene setup, anchor computation and
the pipeline compile instead of landing on the user's first result.

Two earlier designs failed and are worth remembering:

- warming with a trivial *Pallas* kernel submitted a Mosaic build to
  the remote compile service, which serializes - the critical-path XLA
  compile queued behind it and time-to-first-result roughly doubled.
  The warm op must be plain XLA (compiles in <1 s).
- skipping the warm entirely left the init on the first result fetch:
  cold time-to-first-result swung between ~35 s and ~250 s run-to-run.

Disable with ``PLANETMAPPER_TPU_SESSION_WARM=0``. CPU backends skip
automatically (no session to establish).
"""

from __future__ import annotations

import os
import threading

_lock = threading.Lock()
_thread: threading.Thread | None = None
_started = False


def _session_warm() -> None:  # pragma: no cover - timing-only effect
    try:
        import jax
        import jax.numpy as jnp

        v = jax.jit(lambda x: jnp.sum(x * 2.0))(
            jnp.ones((128,), jnp.float32)
        )
        # proxied transports ack dispatch before execution completes; a
        # data fetch is the only completion proof (see bench.py)
        float(v)
    except Exception:
        pass  # best-effort: the first real fetch pays the init instead


def start_session_warm() -> None:
    """Start the one-time session warm thread (idempotent, TPU only)."""
    global _started, _thread
    if _started:
        return
    with _lock:
        if _started:
            return
        _started = True
    if os.environ.get('PLANETMAPPER_TPU_SESSION_WARM', '1') == '0':
        return
    try:
        import jax

        if jax.default_backend() in ('cpu',):
            return
    except Exception:
        return
    _thread = threading.Thread(
        target=_session_warm, name='planetmapper-session-warm',
        daemon=True,
    )
    _thread.start()


def wait_for_session(timeout: float | None = None) -> None:
    """Block until the session warm (if started) completes. Callers
    that time their own first computation (benchmarks) use this to
    separate session establishment from compile/compute time."""
    t = _thread
    if t is not None:
        t.join(timeout)
