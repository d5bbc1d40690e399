"""Scratch-directory hygiene for benches and parity queries.

Free disk is a first-order performance variable in this sandbox (measured
round 3: the filesystem slows 5-20× as it fills — the entire r02 pipeline
"regression" was accumulated bench debris), so every scratch dir is (a)
claimed at creation with an ``owner.pid`` stamp written ATOMICALLY with the
mkdtemp (no window in which a concurrent purge sees an unstamped live dir),
and (b) purged by prefix when its owner is provably gone. The stamp records
``pid start_ticks`` — the owner's /proc start time — so a recycled pid
cannot keep crashed-run debris alive, and purge age-gates on mtime as a
last defence against clock-skewed stamps.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

# every scratch prefix any part of the engine creates; purge matches these
SCRATCH_PREFIXES = (
    "imagor_bench_",
    "imagor_xform_",
    "imagor_xform_shared_",
    "imagor_ck_",
)

MIN_PURGE_AGE_S = 60.0


def _proc_start_ticks(pid: int) -> int | None:
    """Field 22 of /proc/<pid>/stat (starttime, clock ticks since boot) —
    distinguishes a live owner from an unrelated process that recycled its
    pid. Linux-only; None where unreadable."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        # comm may contain spaces/parens: parse after the LAST ')'
        return int(stat.rsplit(")", 1)[1].split()[19])
    except (OSError, IndexError, ValueError):
        return None


def claim_workdir(path: str) -> None:
    """Stamp ``path`` as owned by this process (pid + /proc start ticks).

    A failed stamp write PROPAGATES (r5 ADVICE #4): an unstamped live dir
    reads as crashed-run debris to ``purge_stale_workdirs`` and would be
    rmtree'd out from under its owner once 60 s old — and the likeliest
    write failure (ENOSPC) is exactly the condition this module manages.
    Failing the claim fast turns a would-be mid-run data loss into an
    immediate, attributable setup error."""
    me = os.getpid()
    ticks = _proc_start_ticks(me)
    with open(os.path.join(path, "owner.pid"), "w") as f:
        f.write(f"{me} {ticks if ticks is not None else ''}".strip())


def make_workdir(prefix: str, base: str | None = None) -> str:
    """mkdtemp + claim in one call — the only way scratch dirs are made, so
    no dir ever exists unstamped (the r4 TOCTOU window). If the claim
    cannot be written the dir is removed and the OSError propagates
    (never hand out a dir a concurrent purge may delete mid-run)."""
    d = tempfile.mkdtemp(prefix=prefix, dir=base)
    try:
        claim_workdir(d)
    except OSError:
        shutil.rmtree(d, ignore_errors=True)
        raise
    return d


def _owner_alive(stamp_path: str) -> bool:
    try:
        parts = open(stamp_path).read().split()
        pid = int(parts[0])
    except (OSError, ValueError, IndexError):
        return False  # no/unreadable stamp → crashed-run debris
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        pass  # exists, different user
    except OSError:
        return False
    if len(parts) > 1:
        ticks = _proc_start_ticks(pid)
        if ticks is not None and str(ticks) != parts[1]:
            return False  # pid recycled by an unrelated process
    return True


def purge_stale_workdirs(min_age_s: float = MIN_PURGE_AGE_S) -> int:
    """Remove scratch dirs whose owner process is gone. Dirs younger than
    ``min_age_s`` are always kept: even a dir with a missing stamp may be
    a sibling's mkdtemp that our listing raced (defence in depth — stamps
    are written atomically with creation, but another writer may not use
    this module)."""
    now = time.time()
    n = 0
    bases = {tempfile.gettempdir()}
    if os.path.isdir("/dev/shm"):  # tmpfs workdirs (--workdir-tmpfs) leak RAM
        bases.add("/dev/shm")
    for pat, base in ((p, b) for p in SCRATCH_PREFIXES for b in bases):
        for d in glob.glob(os.path.join(base, pat + "*")):
            try:
                if now - os.path.getmtime(d) < min_age_s:
                    continue
            except OSError:
                continue
            if _owner_alive(os.path.join(d, "owner.pid")):
                continue
            shutil.rmtree(d, ignore_errors=True)
            n += 1
    return n
