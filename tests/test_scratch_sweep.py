"""Orphaned-scratch-dir reclamation (scratch.py).

Pid-derived scratch names mean a SIGKILLed process's dir would never
be reclaimed by a later run; claim_scratch_dir sweeps dead siblings on
first claim. These tests fabricate sibling dirs under a fake temp root.
"""

from __future__ import annotations

import os

from pyspark_postgres_loader_spark import scratch


def _mk(tmp_path, base: str, pid: int, tag: str = "deadbeef1234") -> str:
    p = tmp_path / f"{base}_{os.getuid()}_{pid}_{tag}"
    p.mkdir()
    (p / "payload.txt").write_text("x")
    return str(p)


def _free_pid() -> int:
    """A pid that is certainly not alive (max_pid+1 can't exist)."""
    try:
        with open("/proc/sys/kernel/pid_max") as f:
            return int(f.read().strip()) + 1
    except OSError:
        return 2**22 + 12345


def test_sweep_removes_dead_sibling_keeps_live(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    dead = _mk(tmp_path, "swtest", _free_pid())
    mine = _mk(tmp_path, "swtest", os.getpid())
    other_base = _mk(tmp_path, "unrelated", _free_pid())
    scratch.sweep_dead_siblings("swtest")
    assert not os.path.exists(dead)
    assert os.path.exists(mine)  # own pid never swept
    assert os.path.exists(other_base)  # other prefixes untouched


def test_claim_sweeps_then_creates(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    dead = _mk(tmp_path, "swclaim", _free_pid(), tag="aa11")
    got = scratch.claim_scratch_dir("swclaim", "bb22")
    assert os.path.isdir(got)
    assert f"_{os.getpid()}_bb22" in os.path.basename(got)
    assert not os.path.exists(dead)
    # idempotent: second claim returns the same path and keeps contents
    open(os.path.join(got, "keep.txt"), "w").write("y")
    again = scratch.claim_scratch_dir("swclaim", "bb22")
    assert again == got
    assert os.path.exists(os.path.join(got, "keep.txt"))


def test_sweep_ignores_malformed_names(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    odd = tmp_path / f"swodd_{os.getuid()}_notapid_zz"
    odd.mkdir()
    scratch.sweep_dead_siblings("swodd")
    assert odd.exists()


def test_sweep_reclaims_provably_recycled_pid(monkeypatch, tmp_path):
    """Pid recycling, provable via /proc start time: an orphan whose
    recorded pid now belongs to an unrelated LIVE process that STARTED
    AFTER the dir was last touched is swept immediately (no staleness
    wait); a dir whose live pid predates it is the legitimate owner
    and is kept even past the mtime cutoff (r9 ADVICE: a long-running
    owner must never lose its dir)."""
    import os
    import time

    from pyspark_postgres_loader_spark import scratch

    monkeypatch.setattr(
        scratch.tempfile, "gettempdir", lambda: str(tmp_path)
    )
    uid = os.getuid()
    now = time.time()
    recycled = tmp_path / f"swt_{uid}_1_deadbeef"  # pid 1 is always alive
    owned = tmp_path / f"swt_{uid}_1_cafef00d"
    recycled.mkdir()
    owned.mkdir()
    # recycled: fresh mtime, but the live pid started an hour later
    os.utime(recycled, (now - 7200, now - 7200))
    # owned: mtime far past the staleness cutoff, but the live pid
    # predates the dir — legitimate long-running owner
    old = now - scratch._STALE_SECONDS - 60
    os.utime(owned, (old, old))
    # Both dirs record pid 1; the sweep probes start time once per dir
    # in listdir order — map each probe to its dir's intended start.
    starts = {recycled.name: now - 3600, owned.name: old - 1000}
    order = sorted(n for n in os.listdir(tmp_path) if n.startswith("swt_"))
    starts_list = [starts[n] for n in order]
    calls: list[int] = []

    def start_time(pid: int) -> float:
        calls.append(pid)
        return starts_list[len(calls) - 1]

    monkeypatch.setattr(scratch, "_proc_start_time", start_time)
    monkeypatch.setattr(scratch.os, "listdir", lambda p: order)
    scratch.sweep_dead_siblings("swt")
    assert not recycled.exists()  # live pid, started after dir: recycled
    assert owned.exists()  # live pid, predates dir: kept despite mtime


def test_sweep_mtime_fallback_without_proc(monkeypatch, tmp_path):
    """Where /proc start times are unavailable the 7-day mtime bound
    still reclaims alive-probing orphans, and fresh dirs survive."""
    import os
    import time

    from pyspark_postgres_loader_spark import scratch

    monkeypatch.setattr(
        scratch.tempfile, "gettempdir", lambda: str(tmp_path)
    )
    monkeypatch.setattr(scratch, "_proc_start_time", lambda pid: None)
    uid = os.getuid()
    stale = tmp_path / f"swf_{uid}_1_deadbeef"
    fresh = tmp_path / f"swf_{uid}_1_cafef00d"
    stale.mkdir()
    fresh.mkdir()
    old = time.time() - scratch._STALE_SECONDS - 60
    os.utime(stale, (old, old))
    scratch.sweep_dead_siblings("swf")
    assert not stale.exists()  # past cutoff, recycling unprovable: swept
    assert fresh.exists()  # recent + live pid: untouched


def test_claim_refreshes_mtime(monkeypatch, tmp_path):
    """Repeat claims re-touch the dir so a live owner never ages into
    the staleness window (files rewritten in place don't bump dir
    mtime)."""
    import os
    import time

    from pyspark_postgres_loader_spark import scratch

    monkeypatch.setattr(
        scratch.tempfile, "gettempdir", lambda: str(tmp_path)
    )
    got = scratch.claim_scratch_dir("swtouch", "cc33")
    old = time.time() - scratch._STALE_SECONDS - 60
    os.utime(got, (old, old))
    again = scratch.claim_scratch_dir("swtouch", "cc33")
    assert again == got
    assert os.path.getmtime(got) > old + scratch._STALE_SECONDS / 2
