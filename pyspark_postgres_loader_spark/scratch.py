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
# old is an orphan — but ONLY when the recycling can actually be
# proven or nothing stronger is available (r9 ADVICE: a legitimately
# long-running process must never lose its dir). Two guards make that
# safe: ``claim_scratch_dir`` re-touches the dir on every claim so a
# live owner's mtime stays fresh, and where ``/proc`` exposes process
# start times the sweep removes an alive-probing dir only when the
# process provably started AFTER the dir existed (pid recycled ⇒ the
# creator is dead).
_STALE_SECONDS = 7 * 24 * 3600


def _proc_start_time(pid: int) -> float | None:
    """Process start time as a unix timestamp via ``/proc`` (Linux),
    else ``None``. Field 22 of ``/proc/<pid>/stat`` is clock ticks
    since boot; boot time comes from ``/proc/stat``'s ``btime``."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read()
        # comm can contain spaces/parens: split after the LAST ')'.
        fields = stat[stat.rindex(b")") + 2 :].split()
        ticks = int(fields[19])  # starttime is field 22, 0-indexed 19 here
        with open("/proc/stat", "rb") as f:
            for line in f:
                if line.startswith(b"btime "):
                    btime = int(line.split()[1])
                    break
            else:
                return None
        return btime + ticks / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):
        return None


def sweep_dead_siblings(base: str) -> None:
    """Remove ``{base}_{uid}_{pid}_*`` temp dirs whose pid is dead, or
    whose pid was provably recycled / whose mtime is older than
    ``_STALE_SECONDS`` (pid-recycling bound).

    Only this uid's dirs are considered (other users' dirs are not
    removable anyway), and only exact pattern matches. A live owner is
    protected two ways: when ``/proc`` start times are readable, an
    alive-probing pid older than the dir keeps its dir no matter the
    mtime (only a provably-recycled pid — process started after the
    dir last changed — is swept early); and ``claim_scratch_dir``
    refreshes the dir mtime on every claim, so even without ``/proc``
    a live owner stays inside the staleness window for as long as it
    keeps claiming.
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
        pid = int(m.group(1))
        stale = False
        if _pid_alive(pid):
            try:
                mtime = os.path.getmtime(path)
            except OSError:
                continue  # raced away / unreadable: leave it
            started = _proc_start_time(pid)
            if started is not None:
                # Provable: pid recycled iff the process began after
                # the dir was last touched (60 s slack for clock/tick
                # rounding). A genuine owner always predates its dir.
                # Inside the 60 s ambiguity band the proof is
                # inconclusive (a pid recycled within the slack of the
                # dir's last touch looks like the owner), so the mtime
                # staleness fallback still applies there — a genuine
                # owner keeps re-touching via claim_scratch_dir and
                # never ages past the cutoff (r10 ADVICE).
                stale = started > mtime + 60.0 or (
                    started > mtime - 60.0 and mtime < cutoff
                )
            else:
                stale = mtime < cutoff
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
    # Keep a live owner's mtime fresh: makedirs(exist_ok=True) does NOT
    # update mtime on reuse, and files rewritten in place don't either,
    # so without this a long-running claimer would age into the
    # staleness window (r9 ADVICE).
    try:
        os.utime(path, None)
    except OSError:
        pass
    return path
