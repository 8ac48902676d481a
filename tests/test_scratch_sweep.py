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


def test_sweep_reclaims_stale_dir_even_with_live_pid(monkeypatch, tmp_path):
    """Pid recycling bound: an orphan whose recorded pid now belongs to
    an unrelated LIVE process (here: pid 1) is still swept once its
    mtime crosses the staleness cutoff; a fresh dir with a live pid is
    left alone."""
    import os
    import time

    from pyspark_postgres_loader_spark import scratch

    monkeypatch.setattr(
        scratch.tempfile, "gettempdir", lambda: str(tmp_path)
    )
    uid = os.getuid()
    stale = tmp_path / f"swt_{uid}_1_deadbeef"  # pid 1 is always alive
    fresh = tmp_path / f"swt_{uid}_1_cafef00d"
    stale.mkdir()
    fresh.mkdir()
    old = time.time() - scratch._STALE_SECONDS - 60
    os.utime(stale, (old, old))
    scratch.sweep_dead_siblings("swt")
    assert not stale.exists()  # stale + recycled pid: reclaimed
    assert fresh.exists()  # recent + live pid: untouched
