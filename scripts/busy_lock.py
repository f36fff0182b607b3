"""Advisory TPU-busy lock shared with bench.py.

Long-running TPU jobs (teacher training, distillation, quality
validation, probe sweeps) hold ``/tmp/ezaudio_tpu_busy.lock`` while they
own the single tunnel chip; ``bench.py::_check_busy_lock`` refuses to
measure through a contended chip and emits the last-known-good artifact
instead (a contended measurement would silently record a degraded number
as fresh).  /tmp dies with the VM, so a lock can never outlive its job
across machine rotations; a dead-PID lock is ignored by the reader and
overwritten by the next writer.
"""

import contextlib
import json
import os

LOCK_PATH = "/tmp/ezaudio_tpu_busy.lock"


def _holder_alive():
    """Return the live holder's (pid, job) or None."""
    try:
        with open(LOCK_PATH) as f:
            lock = json.load(f)
        pid = int(lock["pid"])
    except (OSError, ValueError, KeyError, TypeError):
        return None
    if pid != os.getpid() and os.path.isdir(f"/proc/{pid}"):
        return pid, lock.get("job", "?")
    return None


@contextlib.contextmanager
def busy_lock(job: str, enabled: bool = True):
    """Hold the advisory busy lock for the duration of a TPU job.

    ``enabled=False`` (e.g. CPU smoke runs) is a no-op.  If another LIVE
    process already holds the lock we do not clobber it — the job still
    runs (the lock is advisory, for bench only), but we won't delete the
    other holder's lock on exit.
    """
    if not enabled:
        yield
        return
    owned = False
    other = _holder_alive()
    if other is None:
        try:
            with open(LOCK_PATH, "w") as f:
                json.dump({"pid": os.getpid(), "job": job}, f)
            owned = True
        except OSError:
            pass
    else:
        print(f"[busy_lock] lock already held by live pid {other[0]} "
              f"(job: {other[1]}); running anyway without owning it",
              flush=True)
    try:
        yield
    finally:
        if owned:
            try:
                os.remove(LOCK_PATH)
            except OSError:
                pass
