"""Stall watchdog: a wedged loop must be hard-killed with exit 87 and a
STALLED marker (utils/watchdog.py; the reference's only analog is
heyhi's job-level DEAD status, heyhi/__init__.py:126-187)."""
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_watchdog_aborts_wedged_process(tmp_path):
    code = f"""
import sys, time
sys.path.insert(0, {str(REPO)!r})
from rebel_tpu.utils.watchdog import StallWatchdog
wd = StallWatchdog(1.0, {str(tmp_path)!r}, what="test").start()
wd.alive(7)
time.sleep(120)  # "wedged device call"
"""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, timeout=60
    )
    assert proc.returncode == 87, (proc.returncode, proc.stderr[-500:])
    assert time.time() - t0 < 30
    marker = json.loads((tmp_path / "STALLED").read_text())
    assert marker["last_tag"] == 7
    assert marker["what"] == "test"


def test_watchdog_disabled_and_clean_stop(tmp_path):
    from rebel_tpu.utils.watchdog import StallWatchdog

    # timeout 0: start() is a no-op.
    wd = StallWatchdog(0, tmp_path).start()
    assert wd._thread is None
    # armed, fed, stopped: no STALLED marker.
    wd2 = StallWatchdog(30.0, tmp_path).start()
    wd2.alive(1)
    wd2.stop()
    assert not (tmp_path / "STALLED").exists()
