"""Unit pins for the quiet-anchor wrapper's pure logic (VERDICT r11 #2 +
ADVICE r11): round inference must refuse to mislabel, and the cross-
invocation min-of-record merge must only fold same-population artifacts.

No Spark here — bench_quiet's measurement path IS bench.bench_keys (the
driver protocol, exercised by every bench run); what needs pinning is the
artifact bookkeeping around it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_quiet import LoadSampler, infer_round, merge_min_of_record  # noqa: E402


def _git(repo, *args):
    subprocess.run(["git", *args], cwd=repo, check=True, capture_output=True)


def test_infer_round_flags_untracked_current_round(tmp_path):
    """ADVICE r11: the driver can write BENCH_r{N}.json for the CURRENT
    round mid-build (observed: untracked BENCH_r11.json on the r11 tree),
    so max+1 would label the quiet anchor one round ahead.  Tracked max =
    round closed = unambiguous; untracked max = ambiguous, caller must
    pass --round."""
    repo = str(tmp_path)
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    # no BENCH files at all -> round 1, unambiguous
    assert infer_round(repo) == (1, False)
    # tracked r1 -> round 2, unambiguous
    (tmp_path / "BENCH_r1.json").write_text("{}")
    _git(repo, "add", "BENCH_r1.json")
    _git(repo, "commit", "-qm", "r1")
    assert infer_round(repo) == (2, False)
    # untracked r2 (driver wrote the CURRENT round's file) -> ambiguous
    (tmp_path / "BENCH_r2.json").write_text("{}")
    assert infer_round(repo) == (3, True)
    # tracked r2 -> round 3 unambiguous again
    _git(repo, "add", "BENCH_r2.json")
    _git(repo, "commit", "-qm", "r2")
    assert infer_round(repo) == (3, False)


def test_merge_min_of_record_same_population_only():
    clean = {"a": 2.0, "b": 5.0}
    # no prior artifact -> fresh
    merged, n = merge_min_of_record(None, "c1", 0.1, 12, clean)
    assert merged == clean and n == 1
    # same commit+sf+round -> per-key min, union of keys, count bumps
    prev = {
        "head_commit": "c1",
        "sf": 0.1,
        "round": 12,
        "per_key_min_of_record": {"a": 3.0, "b": 4.0, "c": 1.0},
        "min_of_record_invocations": 2,
    }
    merged, n = merge_min_of_record(prev, "c1", 0.1, 12, clean)
    assert merged == {"a": 2.0, "b": 4.0, "c": 1.0} and n == 3
    # the quiet flag is judged against the MERGED record: 'c' has no clean
    # reading in THIS invocation but stays covered by the prior one, so a
    # suite over {a, b, c} has no missing-from-record keys here
    assert set(merged) == {"a", "b", "c"}
    # a different tree/scale/round is a different population -> fresh
    for other in (
        {**prev, "head_commit": "c2"},
        {**prev, "sf": 0.01},
        {**prev, "round": 11},
    ):
        merged, n = merge_min_of_record(other, "c1", 0.1, 12, clean)
        assert merged == clean and n == 1


def test_load_sampler_window_attribution():
    """window_max must cover the EWMA lookback (a burst shortly before a
    key's timed window still inflates its 1-min load) and fall back to the
    nearest sample for sub-period windows."""
    s = LoadSampler()
    # full 3-tuple (epoch, load, iowait) sample shape — the artifact path
    # consumes all three channels, so the pins must too (a 2-tuple fixture
    # let a tape-wide unpack bug through once)
    s.samples = [
        (100.0, 0.5, 0.0),
        (105.0, 8.0, 2.0),
        (110.0, 0.6, 0.0),
        (140.0, 0.4, 0.0),
        (170.0, 0.3, 0.0),
    ]
    # burst at t=105 attributed to a window starting t=120 (30 s lookback)
    assert s.window_max(120.0, 125.0) == 8.0
    # a clean window whose 30 s lookback clears the burst
    assert s.window_max(165.0, 168.0) == 0.4
    # sub-period window with no in-range samples -> nearest sample
    assert s.window_max(1000.0, 1000.2) == 0.3
    # tape-wide max over 3-tuple samples (the load_max_1min artifact field)
    assert s.load_max() == 8.0
    assert LoadSampler().load_max() == 0.0


def test_load_sampler_iowait_channel():
    """The iowait tape (round-12 capstone ABAB finding: neighbor IO
    stalls drift per-key bands 10-18 s while 1-min load reads < 0.5).
    Recorded per key, never gated on — this pins the delta computation
    and the window attribution."""
    s = LoadSampler()
    # simulate two /proc/stat reads 5 s apart: 8 cpus, 40 ticks total,
    # 12 of them iowait -> 30%
    s._last_cpu = (1000, 100)
    s.samples = [(100.0, 0.2, 0.0), (105.0, 0.3, 30.0), (140.0, 0.2, 1.0)]
    assert s.window_iowait_max(103.0, 106.0) == 30.0
    assert s.window_iowait_max(133.0, 141.0) == 30.0  # 30 s lookback covers 105
    assert s.window_iowait_max(138.0, 141.0) == 1.0   # ... and 138-30 clears it
    assert s.window_iowait_max(170.0, 171.0) == 1.0   # nearest fallback
    # live read smoke: monotone counters give a bounded percentage
    s2 = LoadSampler()
    first = s2._iowait_pct()   # no previous sample -> 0.0
    assert first == 0.0
    pct = s2._iowait_pct()
    assert 0.0 <= pct <= 100.0


def test_head_commit_distinguishes_dirty_trees(tmp_path):
    """The same-population merge keys on head_commit; a bare HEAD string
    would merge artifacts measured on different code when a file was
    edited uncommitted between invocations.  Dirty trees get a suffix
    derived from the working-tree delta, so two invocations on the same
    dirty state still merge while a further edit splits the population."""
    from bench_quiet import head_commit

    repo = str(tmp_path)
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    (tmp_path / "f.py").write_text("x = 1\n")
    _git(repo, "add", "f.py")
    _git(repo, "commit", "-qm", "c1")
    clean = head_commit(repo)
    assert len(clean) == 40 and "-dirty-" not in clean
    # dirty tree -> suffixed, stable across calls on the same state
    (tmp_path / "f.py").write_text("x = 2\n")
    d1 = head_commit(repo)
    assert d1.startswith(clean + "-dirty-") and d1 == head_commit(repo)
    # a FURTHER edit is a different population
    (tmp_path / "f.py").write_text("x = 3\n")
    assert head_commit(repo) != d1
    # non-git dir -> 'unknown', never ''
    assert head_commit(str(tmp_path / "nowhere")) == "unknown"


def test_infer_round_degrades_without_git(tmp_path, monkeypatch):
    """A missing/hung git binary must degrade to 'ambiguous' (caller
    passes --round), not crash with a traceback before main() can say
    so."""
    import bench_quiet as bq

    (tmp_path / "BENCH_r7.json").write_text("{}")

    def boom(*a, **kw):
        raise FileNotFoundError("git")

    monkeypatch.setattr(bq.subprocess, "run", boom)
    assert bq.infer_round(str(tmp_path)) == (8, True)


def test_fold_retry_results_bookkeeping():
    """The three retry-fold rules (see fold_retry_results docstring):
    failure supersession, record-following attribution, and
    failed-in-every-earlier-pass keys seeding the record."""
    from bench_quiet import fold_retry_results

    # state after pass 1: a/b contaminated readings, c failed outright
    timings = {"a": 1.8, "b": 2.0}
    run_pairs = {"a": [1.8, 2.1], "b": [2.0, 2.4]}
    failures = {"c": "Py4JError: transient"}
    key_load_max = {"a": 7.0, "b": 6.5}
    key_iowait_max = {"a": 0.5, "b": 0.3}
    clean_min: dict[str, float] = {}

    # retry: a clean-but-slower (2.2 @ load 0.4, iowait 20 — the IO-stall
    # window), b clean-and-faster, c now succeeds clean
    still = fold_retry_results(
        ["a", "b", "c"],
        rt={"a": 2.2, "b": 1.7, "c": 3.0},
        rp={"a": [2.2, 2.5], "b": [1.7, 1.9], "c": [3.0, 3.2]},
        rf={},
        lm_map={"a": 0.4, "b": 0.5, "c": 0.6},
        iw_map={"a": 20.0, "b": 0.1, "c": 0.2},
        timings=timings,
        run_pairs=run_pairs,
        failures=failures,
        key_load_max=key_load_max,
        key_iowait_max=key_iowait_max,
        clean_min=clean_min,
        own_ceil=5.0,
    )
    assert still == []
    # clean readings recorded for all three; c seeded from nothing
    assert clean_min == {"a": 2.2, "b": 1.7, "c": 3.0}
    # c's transient failure is superseded by the clean success
    assert failures == {}
    # attribution follows the reading of record: a's record is the clean
    # retry window (load 0.4, iowait 20) even though the contaminated
    # pass-1 attempt was numerically faster — min()-ing would have kept
    # (7.0, 0.5) and hidden the IO stall of the measured window
    assert key_load_max["a"] == 0.4 and key_iowait_max["a"] == 20.0
    assert key_load_max["b"] == 0.5 and key_iowait_max["b"] == 0.1
    # timings keeps the cross-attempt min (detail), record prefers clean
    assert timings == {"a": 1.8, "b": 1.7, "c": 3.0}

    # a retry that is STILL burst-hit: no clean entry, stays contaminated,
    # attribution only adopted if the new reading IS the running min
    timings2 = {"d": 3.0}
    klm2, kim2 = {"d": 8.0}, {"d": 1.0}
    still2 = fold_retry_results(
        ["d"],
        rt={"d": 2.5},
        rp={"d": [2.5, 2.8]},
        rf={},
        lm_map={"d": 6.0},
        iw_map={"d": 9.9},
        timings=timings2,
        run_pairs={"d": [3.0, 3.3]},
        failures={},
        key_load_max=klm2,
        key_iowait_max=kim2,
        clean_min={},
        own_ceil=5.0,
    )
    assert still2 == ["d"] and timings2["d"] == 2.5
    # 2.5 became the running min -> its window (6.0, 9.9) describes it
    assert klm2["d"] == 6.0 and kim2["d"] == 9.9

    # a retry that fails keeps the key failed and contaminated
    failures3 = {}
    still3 = fold_retry_results(
        ["e"],
        rt={},
        rp={},
        rf={"e": "OOM"},
        lm_map={},
        iw_map={},
        timings={},
        run_pairs={},
        failures=failures3,
        key_load_max={},
        key_iowait_max={},
        clean_min={},
        own_ceil=5.0,
    )
    assert still3 == ["e"] and failures3 == {"e": "OOM"}


def test_head_commit_ignores_measurement_artifacts(tmp_path):
    """Invocation N rewrites the quiet artifact; if that rewrite changed
    the tree fingerprint, invocation N+1 could never merge its
    min-of-record (round-12 regression: two back-to-back runs at one
    HEAD, zero merges).  Artifact files are excluded from the dirty
    hash; real source edits still change it."""
    import subprocess
    from bench_quiet import head_commit

    repo = str(tmp_path)
    subprocess.run(["git", "init", "-q", repo], check=True)
    subprocess.run(["git", "-C", repo, "config", "user.email", "t@t"], check=True)
    subprocess.run(["git", "-C", repo, "config", "user.name", "t"], check=True)
    (tmp_path / "code.py").write_text("x = 1\n")
    (tmp_path / "BENCH_QUIET_r12.json").write_text("{}")
    subprocess.run(["git", "-C", repo, "add", "-A"], check=True)
    subprocess.run(["git", "-C", repo, "commit", "-qm", "init"], check=True)
    clean = head_commit(repo)
    assert "-dirty-" not in clean
    # rewriting the artifact (tracked) or dropping a new detail file
    # (untracked) must NOT change the fingerprint
    (tmp_path / "BENCH_QUIET_r12.json").write_text('{"value": 1}')
    (tmp_path / "BENCH_DETAIL.json").write_text("{}")
    assert head_commit(repo) == clean
    # a source edit must still flip it
    (tmp_path / "code.py").write_text("x = 2\n")
    assert head_commit(repo).startswith(clean + "-dirty-")
