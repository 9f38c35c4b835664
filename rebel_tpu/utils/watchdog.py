"""Training-loop stall watchdog.

The reference's failure handling is job-level only (heyhi DEAD status
from `squeue`, /root/reference/heyhi/__init__.py:126-187): a wedged
worker just stops producing and the scheduler eventually notices.  On a
remote-device runtime the analogous failure is sharper: a dead device
tunnel blocks the epoch loop inside an *uninterruptible native wait* —
the process sleeps forever at zero CPU, signals queue behind the stuck
call, and the run neither progresses nor exits (observed live: a
training run and an eval both froze mid-device-call when the tunnel
relay dropped).  The only reliable recovery is a hard process exit so
the launcher / scheduler / `--mode start_continue` machinery can take
over with the last checkpoint.
"""

from __future__ import annotations

import json
import logging
import os
import pathlib
import threading
import time

log = logging.getLogger(__name__)

# Distinct exit code so wrappers can tell "stalled" from crashes.
STALL_EXIT_CODE = 87


class StallWatchdog:
    """Hard-exits the process when no progress is reported for
    ``timeout_s`` seconds.  ``timeout_s <= 0`` disables it entirely.

    Usage::

        wd = StallWatchdog(cfg.stall_timeout_s, out_dir)
        wd.start()
        for epoch in ...:
            ...          # device work that could wedge forever
            wd.alive(epoch)
        wd.stop()

    The monitor is a daemon thread; ``os._exit`` is deliberate — the
    main thread is stuck in a native call that Python exceptions and
    signals cannot reach.  A ``STALLED`` marker with the last epoch and
    timestamp is written next to the metrics so the experiment-dir
    status machinery (and humans) can see why the process died.
    """

    def __init__(
        self,
        timeout_s: float,
        out_dir: str | pathlib.Path | None = None,
        what: str = "train",
    ):
        self.timeout_s = float(timeout_s or 0)
        self.out_dir = pathlib.Path(out_dir) if out_dir else None
        self.what = what
        self._last = time.time()
        self._last_tag: int | str | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "StallWatchdog":
        if self.timeout_s <= 0 or self._thread is not None:
            return self
        self._last = time.time()
        self._thread = threading.Thread(
            target=self._watch, name="stall-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def alive(self, tag: int | str | None = None) -> None:
        """Report progress (e.g. once per epoch)."""
        self._last = time.time()
        self._last_tag = tag

    def stop(self) -> None:
        self._stop.set()

    # ------------------------------------------------------------ guts
    def _watch(self) -> None:
        poll = max(1.0, min(60.0, self.timeout_s / 4))
        while not self._stop.wait(poll):
            idle = time.time() - self._last
            if idle <= self.timeout_s:
                continue
            msg = (
                f"{self.what} loop made no progress for {idle:.0f}s "
                f"(> {self.timeout_s:.0f}s); last progress tag: "
                f"{self._last_tag!r}. Assuming a wedged device call; "
                f"hard-exiting {STALL_EXIT_CODE} so the launcher can "
                "restart from the last checkpoint."
            )
            log.error(msg)
            if self.out_dir is not None:
                try:
                    (self.out_dir / "STALLED").write_text(
                        json.dumps(
                            {
                                "ts": time.time(),
                                "idle_s": idle,
                                "timeout_s": self.timeout_s,
                                "last_tag": self._last_tag,
                                "what": self.what,
                            }
                        )
                    )
                except OSError:
                    pass
            os._exit(STALL_EXIT_CODE)
