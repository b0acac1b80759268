"""Device-connection keepalive for remote-attached accelerators.

The axon tunnel's single-chip claim has been observed (round 4, repeatedly)
to go silently unusable after a few minutes without device activity: the
next device op then blocks forever — no error, no timeout. Long-lived
processes that interleave heavy host stages (parse, generation, CSV) with
device dispatches therefore keep a 1 ms heartbeat running.

``ensure_device_keepalive()`` is idempotent and a no-op on the CPU backend;
engine entry points call it before device work. The heartbeat adds ~1 ms of
device time per 45 s — noise against any measured stage.
"""

from __future__ import annotations

import threading
import time

_started = False
_lock = threading.Lock()

INTERVAL_S = 45.0


def ensure_device_keepalive() -> None:
    """Start the heartbeat thread once per process (non-CPU backends only)."""
    global _started
    if _started:
        return
    with _lock:
        if _started:
            return
        import jax

        if jax.default_backend() == "cpu":
            _started = True  # nothing to keep alive; don't re-check
            return

        def loop():
            import jax.numpy as jnp
            import numpy as np

            x = jnp.zeros(128)
            while True:
                try:
                    # fetch (d2h) rather than block_until_ready: on the axon
                    # backend ready-events can fire at enqueue (CLAUDE.md),
                    # and a heartbeat that never round-trips might not
                    # actually exercise the tunnel
                    np.asarray((x + 1.0)[:1])
                except Exception:
                    pass
                time.sleep(INTERVAL_S)

        threading.Thread(
            target=loop, name="sidtpu-device-keepalive", daemon=True
        ).start()
        _started = True
