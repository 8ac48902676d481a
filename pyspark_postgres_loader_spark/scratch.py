"""Process-scoped scratch directories with orphan reclamation.

Several queries materialize small fixture-derived files under the
system temp dir (schema-evolution generations in
``operators/json_ops.py``, the file_tail event log in
``sources/filetail.py``). The dirs are named
``{base}_{uid}_{pid}_{tag}`` so concurrent processes never collide, and
an atexit hook removes them — but a crashed or SIGKILLed process leaks
its directory permanently, because no later run recreates that pid.
``claim_scratch_dir`` therefore sweeps dead siblings (same base + uid,
pid no longer alive) before handing out the caller's own path, so
repeated bench/pytest runs converge instead of accumulating.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile

_CLAIMED: set[str] = set()


def _pid_alive(pid: int) -> bool:
    """True when ``pid`` currently exists (signal 0 probes without
    sending); EPERM means it exists but is owned elsewhere — alive."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return True
    return True


# mtime staleness fallback: an orphan whose dead pid was RECYCLED by an
# unrelated live process probes alive forever and would never be swept
# (r8 ADVICE). Bench/pytest scratch dirs live minutes; anything this
# old is an orphan regardless of what its pid number now points at.
_STALE_SECONDS = 7 * 24 * 3600


def sweep_dead_siblings(base: str) -> None:
    """Remove ``{base}_{uid}_{pid}_*`` temp dirs whose pid is dead, or
    whose mtime is older than ``_STALE_SECONDS`` (pid-recycling bound).

    Only this uid's dirs are considered (other users' dirs are not
    removable anyway), and only exact pattern matches — a live
    process's dir is never touched because its pid probes alive and
    its mtime is recent.
    """
    import time

    tmp = tempfile.gettempdir()
    pat = re.compile(rf"^{re.escape(base)}_{os.getuid()}_(\d+)_[0-9a-f]+$")
    try:
        entries = os.listdir(tmp)
    except OSError:
        return
    cutoff = time.time() - _STALE_SECONDS
    for name in entries:
        m = pat.match(name)
        if m is None or int(m.group(1)) == os.getpid():
            continue
        path = os.path.join(tmp, name)
        stale = False
        if _pid_alive(int(m.group(1))):
            try:
                stale = os.path.getmtime(path) < cutoff
            except OSError:
                continue  # raced away / unreadable: leave it
        else:
            stale = True
        if stale:
            shutil.rmtree(path, ignore_errors=True)


def claim_scratch_dir(base: str, tag: str) -> str:
    """Return (and register for atexit cleanup) this process's scratch
    dir for ``base``/``tag``, sweeping orphans from dead processes
    first. Deterministic per (base, uid, pid, tag): repeat calls within
    a process reuse the same path, so callers can overwrite in place."""
    path = os.path.join(
        tempfile.gettempdir(), f"{base}_{os.getuid()}_{os.getpid()}_{tag}"
    )
    if path not in _CLAIMED:
        sweep_dead_siblings(base)
        _CLAIMED.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path
