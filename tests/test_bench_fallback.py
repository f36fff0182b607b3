"""bench.py outage resilience: when the axon tunnel is down for the whole
bounded retry window, the bench must emit the committed last-known-good
measurement marked ``stale`` and exit 0 — never an all-zero artifact
(round-3 regression: BENCH_r03.json recorded 0.0 during a tunnel outage
even though validated numbers existed).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
LAST_GOOD = os.path.join(REPO, "bench_last_good.json")


def _run_bench(env_extra, timeout=240):
    # pin the busy lock to a test-private path: a concurrent real TPU job
    # holding the default lock must not flip these tests onto the
    # lock-fallback path
    env = dict(os.environ,
               EZAUDIO_BUSY_LOCK=os.path.join(REPO, "tests",
                                              ".bench_test_busy.lock"),
               **env_extra)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, env=env, cwd=REPO)


def test_last_good_committed_and_valid():
    """The fallback file must exist at HEAD and carry a positive validated
    value with provenance, or the stale path degrades to 0.0 again."""
    with open(LAST_GOOD) as f:
        last = json.load(f)
    assert last["value"] > 1.0
    assert last["unit"] == "audio-sec/sec/chip"
    assert last["vs_baseline"] > 1.0
    assert "session_date" in last and "source" in last
    assert last["reference_default_recipe"]["value"] > 1.0
    assert not last.get("stale")  # committed file is the truth, not a copy


def test_forced_outage_emits_stale_last_good():
    """Simulated outage (probe subprocess hangs forever, 3 s budget):
    bench exits 0 with the last-good values marked stale."""
    r = _run_bench({
        "EZAUDIO_BENCH_FORCE_OUTAGE": "1",
        "EZAUDIO_BENCH_WATCHDOG_S": "3",
    })
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    with open(LAST_GOOD) as f:
        last = json.load(f)
    assert out["stale"] is True
    assert "unresponsive" in out["stale_reason"]
    assert out["value"] == last["value"] > 0
    assert out["vs_baseline"] == last["vs_baseline"]
    assert out["reference_default_recipe"]["value"] == \
        last["reference_default_recipe"]["value"]


def _mk_result(fast, ref):
    return {"value": fast, "unit": "audio-sec/sec/chip",
            "vs_baseline": fast, "chips": 1,
            "reference_default_recipe": {"value": ref}}


def test_trend_guard_refuses_degraded_ratio(tmp_path, monkeypatch):
    """VERDICT r4 item 8: a session whose fast/reference ratio dropped
    >15% below the committed last-good's must NOT overwrite the fallback
    file (contended/degraded session) unless EZAUDIO_BENCH_FORCE=1."""
    import bench

    lg = tmp_path / "last_good.json"
    committed = _mk_result(59.0, 6.0)  # ratio ~9.83
    lg.write_text(json.dumps(committed))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(lg))
    monkeypatch.delenv("EZAUDIO_BENCH_FORCE", raising=False)

    # degraded ratio (7.0 < 0.85 * 9.83): refused
    bench._record_last_good(_mk_result(42.0, 6.0))
    assert json.loads(lg.read_text())["value"] == 59.0

    # healthy ratio (within 15%): recorded, with provenance stamped
    bench._record_last_good(_mk_result(55.0, 6.0))
    rec = json.loads(lg.read_text())
    assert rec["value"] == 55.0 and "session_date" in rec

    # degraded + FORCE: recorded
    monkeypatch.setenv("EZAUDIO_BENCH_FORCE", "1")
    bench._record_last_good(_mk_result(30.0, 6.0))
    assert json.loads(lg.read_text())["value"] == 30.0


def test_trend_guard_records_when_no_last_good(tmp_path, monkeypatch):
    import bench

    lg = tmp_path / "none.json"
    monkeypatch.setattr(bench, "_LAST_GOOD", str(lg))
    bench._record_last_good(_mk_result(10.0, 6.0))
    assert json.loads(lg.read_text())["value"] == 10.0


def test_forced_outage_without_last_good_exits_3(tmp_path):
    """No last-good available: keep the old loud 0.0/rc=3 behavior (runs
    bench.py from a copy so the real fallback file is out of reach)."""
    import shutil

    bench_copy = tmp_path / "bench.py"
    shutil.copy(BENCH, bench_copy)
    r = subprocess.run(
        [sys.executable, str(bench_copy)], capture_output=True, text=True,
        timeout=240, cwd=str(tmp_path), env=dict(
            os.environ, EZAUDIO_BENCH_FORCE_OUTAGE="1",
            EZAUDIO_BENCH_WATCHDOG_S="3",
            EZAUDIO_BUSY_LOCK=str(tmp_path / "busy.lock")))
    assert r.returncode == 3, (r.stdout, r.stderr[-2000:])
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 0.0
    assert "unresponsive" in out["error"]
