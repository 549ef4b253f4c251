"""Fault-injection tests for the bench supervisor (bench.py).

The driver's bench run is the round's perf artifact of record; rounds
3-5 each lost entries to a different evidence-pipeline failure (retry
filter string mismatch, all-or-nothing emission, fixed retry count with
a too-short cooldown poisoning cheap entries after a worker crash).
These tests pin the supervisor's failure-handling contract WITHOUT a
TPU, via TURBOMESH_BENCH_FAULT:

  * a crash-class worker death mid-launch leaves every other entry
    completed (the crashed spec is demoted behind the cheap ones),
  * the crashed spec's error is recorded (not silently dropped) once
    attempts are exhausted,
  * the cumulative artifact line is parseable at every emission and the
    partial-artifact path override keeps BENCH_PARTIAL.json untouched.

Reference role: the solve-sweep evidence for smooth.zig:74-166.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_supervisor(tmp_path, fault, budget="2000", timeout=280,
                    cache_dir=None):
    env = dict(os.environ)
    env["TURBOMESH_BENCH_BUDGET_S"] = budget
    env["TURBOMESH_BENCH_COOLDOWN_S"] = "1"
    env["TURBOMESH_BENCH_PARTIAL_PATH"] = str(tmp_path / "partial.json")
    env["TURBOMESH_BENCH_FAULT"] = json.dumps(fault)
    env["JAX_PLATFORMS"] = "cpu"
    if cache_dir is not None:
        env["TURBOMESH_JAX_CACHE"] = str(cache_dir)
    out = subprocess.run(
        [sys.executable, "bench.py", "4,15,8,1,2"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout)
    artifacts = []
    for line in out.stdout.splitlines():
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("metric") == "elliptic_smoothing_run_to_target":
            artifacts.append(rec)
    assert artifacts, out.stdout[-2000:] + out.stderr[-2000:]
    return artifacts


ALL_KEYS = ("scale4", "scale15", "LS89", "T106",
            "scale1", "scale2", "scale8", "sor")


def _sweep_by_key(artifact):
    got = {}
    for rec in artifact["detail"]["sweep"]:
        if "scale_cells" in rec:
            got["scale%d" % rec["scale_cells"]] = rec
        elif "example" in rec:
            got[rec["example"]] = rec
        elif rec.get("entry") == "sor":
            got["sor"] = rec
    return got


def test_all_ok_completes_every_entry(tmp_path):
    fault = {k: "ok" for k in ALL_KEYS}
    final = _run_supervisor(tmp_path, fault)[-1]
    got = _sweep_by_key(final)
    assert set(got) == set(ALL_KEYS)
    assert all("error" not in r and "skipped" not in r
               for r in got.values())
    assert final["detail"]["complete"] is True
    assert final["value"] == 1.0
    # the artifact-of-record path was redirected, not clobbered
    assert (tmp_path / "partial.json").exists()


def test_cold_cache_insurance_order(tmp_path):
    """Fresh container (empty persistent compile cache): scale 1 must
    run FIRST — it is the only device entry whose COLD compile fits a
    short driver budget, so it guarantees the artifact of record a
    nonzero headline even in the worst case. With a warm cache the
    true headline entry (scale 4) keeps the first slot."""
    fault = {k: "ok" for k in ALL_KEYS}

    cold_dir = tmp_path / "cold_cache"
    cold_dir.mkdir()
    order = _run_supervisor(tmp_path, fault,
                            cache_dir=cold_dir)[-1]["detail"]["entry_order"]
    assert order[0] == "scale1", order

    warm_dir = tmp_path / "warm_cache"
    warm_dir.mkdir()
    with open(warm_dir / "big-executable-cache", "wb") as f:
        f.truncate(60 * 1024 * 1024)  # sparse: apparent size is enough
    order = _run_supervisor(tmp_path, fault,
                            cache_dir=warm_dir)[-1]["detail"]["entry_order"]
    assert order[0] == "scale4", order


def test_worker_crash_demoted_cheap_entries_survive(tmp_path):
    fault = {k: "ok" for k in ALL_KEYS}
    fault["scale8"] = "crash"  # the measured crash-prone entry
    arts = _run_supervisor(tmp_path, fault)
    final = arts[-1]
    got = _sweep_by_key(final)
    # every other entry completed despite the mid-launch worker death
    for key in ALL_KEYS:
        if key == "scale8":
            continue
        assert key in got and "error" not in got[key], (key, got.get(key))
    # the crasher was demoted, then rerun with the fused program
    # disabled (the crash follows the program, not the process) and
    # completed — the fault model lets the no_fused rerun succeed
    assert "scale8" in got, sorted(got)
    assert got["scale8"].get("reached_target") is True, got["scale8"]
    # headline survives: largest completed entry that reached target
    assert final["value"] == 1.0
    # every cumulative emission stayed parseable (checked by parsing)
    assert len(arts) >= len(ALL_KEYS)


def test_crashing_spec_reruns_staged_and_completes(tmp_path):
    """Round-5 on-chip failure mode: one spec's FUSED program kills the
    TPU worker even in fresh processes (measured on LS89, four separate
    runs — that spec is now pre-escalated to no_fused in main(), so the
    injected crasher here is T106). After the first crash the
    supervisor must rerun that spec with the fused program disabled
    instead of burning crash+cooldown cycles."""
    fault = {k: "ok" for k in ALL_KEYS}
    fault["T106"] = "crash"
    final = _run_supervisor(tmp_path, fault)[-1]
    got = _sweep_by_key(final)
    assert set(got) == set(ALL_KEYS)
    assert got["T106"].get("reached_target") is True, got["T106"]
    assert final["detail"]["complete"] is True


def test_ls89_starts_no_fused():
    """LS89's fused dispatch is the measured worker-killer on the
    tunneled runtime (4 on-chip crashes); its spec must start with the
    fused program disabled so even the FIRST attempt cannot crash the
    worker (the post-crash escalation still costs a crash + cooldown +
    relaunch cycle, which pushed LS89 out of the rehearsal-3 budget)."""
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.pop(0)
    specs = bench.build_specs([4, 15, 8, 1, 2])
    ls89 = next(s for s in specs
                if s["kind"] == "example" and s["name"] == "LS89")
    assert ls89.get("no_fused") is True
    t106 = next(s for s in specs
                if s["kind"] == "example" and s["name"] == "T106")
    assert not t106.get("no_fused")


def test_budget_expiry_records_pending_entries(tmp_path):
    """No silent caps (VERDICT r4 weak-7 family): entries still pending
    when the budget ends must appear in the FINAL artifact as skipped
    records with their attempt count — in the round-5 rehearsal LS89
    crashed the worker repeatedly and vanished from the final sweep
    with no trace. A sub-launch budget skips everything deterministically."""
    fault = {k: "ok" for k in ALL_KEYS}
    final = _run_supervisor(tmp_path, fault, budget="0")[-1]
    got = _sweep_by_key(final)
    assert set(got) == set(ALL_KEYS), sorted(got)
    for key in ALL_KEYS:
        assert got[key].get("skipped") == "budget", got[key]
        assert got[key].get("attempts") == 0, got[key]
    assert final["detail"]["complete"] is False
    assert final["value"] == 0.0
