import os
import time

from imagor_spark.engine.workdirs import (
    _owner_alive,
    claim_workdir,
    make_workdir,
    purge_stale_workdirs,
)


def _age(d: str, seconds: float) -> None:
    t = time.time() - seconds
    os.utime(d, (t, t))


def test_make_workdir_claims_atomically_and_live_owner_survives_purge():
    d = make_workdir("imagor_bench_")
    try:
        stamp = os.path.join(d, "owner.pid")
        assert os.path.exists(stamp)
        parts = open(stamp).read().split()
        assert int(parts[0]) == os.getpid() and len(parts) == 2
        assert _owner_alive(stamp)
        _age(d, 3600)  # old but owner (this process) is alive → kept
        purge_stale_workdirs()
        assert os.path.isdir(d)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_purge_reclaims_dead_owner_and_age_gates_young_dirs(tmp_path):
    import shutil
    import tempfile

    # dead-owner dir: stamp with an impossible pid
    dead = tempfile.mkdtemp(prefix="imagor_bench_")
    with open(os.path.join(dead, "owner.pid"), "w") as f:
        f.write("999999999 1")
    _age(dead, 3600)
    # young unstamped dir: must survive (mkdtemp race defence)
    young = tempfile.mkdtemp(prefix="imagor_bench_")
    try:
        purge_stale_workdirs()
        assert not os.path.isdir(dead)
        assert os.path.isdir(young)
    finally:
        shutil.rmtree(young, ignore_errors=True)
        shutil.rmtree(dead, ignore_errors=True)


def test_purge_scans_tmpfs_base():
    """--workdir-tmpfs scratch lives in /dev/shm — crashed-run debris there
    holds RAM, so purge must scan it too."""
    import shutil

    if not os.path.isdir("/dev/shm"):
        import pytest

        pytest.skip("no /dev/shm")
    d = os.path.join("/dev/shm", "imagor_bench_testdebris")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "owner.pid"), "w") as f:
        f.write("999999999 1")
    _age(d, 3600)
    try:
        purge_stale_workdirs()
        assert not os.path.isdir(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pid_recycling_detected_via_start_ticks():
    """A stamp whose pid is alive but whose start-ticks don't match is
    crashed-run debris from a recycled pid — provably not the owner."""
    import tempfile

    d = tempfile.mkdtemp(prefix="imagor_bench_")
    try:
        # pid 1 is always alive; its start ticks are ~0, never 999999999
        with open(os.path.join(d, "owner.pid"), "w") as f:
            f.write("1 999999999")
        assert not _owner_alive(os.path.join(d, "owner.pid"))
        # and a re-claim by this process is alive again
        claim_workdir(d)
        assert _owner_alive(os.path.join(d, "owner.pid"))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
