"""Sweep-safety tests for the per-run scratch dirs (round-3 ADVICE:
the old sweep raced concurrent processes — bench overlapping pytest
could delete a LIVE run dir out from under a lazy DataFrame)."""

import os
import time

from customer_review__etl_spark import scratch


def test_sweep_skips_live_owner(tmp_path):
    live = tmp_path / f"run_{os.getpid()}_deadbeef0000"
    live.mkdir()
    old = time.time() - 2 * scratch._GRACE_SEC
    os.utime(live, (old, old))
    assert not scratch._sweepable(live, time.time())


def test_sweep_skips_recent_even_if_owner_dead(tmp_path):
    # PID 2**22-ish beyond pid_max on default systems — treat dead;
    # the dir is fresh, so the grace window must still protect it.
    fresh = tmp_path / "run_99999999_cafecafe0000"
    fresh.mkdir()
    assert not scratch._sweepable(fresh, time.time())


def test_sweep_removes_dead_and_idle(tmp_path):
    stale = tmp_path / "run_99999999_feedfeed0000"
    stale.mkdir()
    old = time.time() - 2 * scratch._GRACE_SEC
    os.utime(stale, (old, old))
    assert scratch._sweepable(stale, time.time())


def test_unparseable_name_falls_back_to_grace(tmp_path):
    odd = tmp_path / "leftover"
    odd.mkdir()
    assert not scratch._sweepable(odd, time.time())  # fresh: keep
    old = time.time() - 2 * scratch._GRACE_SEC
    os.utime(odd, (old, old))
    assert scratch._sweepable(odd, time.time())  # idle + no owner: sweep


def test_run_scratch_creates_under_own_run_dir():
    d = scratch.run_scratch("t_")
    assert os.path.isdir(d)
    assert f"run_{os.getpid()}_" in d
