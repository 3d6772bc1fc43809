"""The chip-queue pre-flight gate (VERDICT r4 item 6): a harness whose CPU
smoke fails must be SKIPPED (loudly, with a results.jsonl record) instead
of burning a chip window on a traceback — round 4 lost ~25 min of its
final TPU window to a bench.py regression its CPU smoke catches in
seconds.

These tests exercise the real chip_preflight.py + chip_queue3.sh pair via
the scripts' test hooks (synthetic failing smoke, custom one-line queue,
probe disabled) — no chip, no long harnesses.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_preflight_records_failure_and_strict_rc(tmp_path):
    out = tmp_path / "preflight.json"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "chip_preflight.py"), str(out),
         "--only", "fakeharness", "--inject-fail", "fakeharness",
         "--strict"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert p.returncode == 1, p.stderr  # --strict: any failure -> rc 1
    verdicts = json.loads(out.read_text())
    assert verdicts["fakeharness"]["ok"] is False


def _run_queue(tmp_path, preflight, queue_cmd):
    outdir = tmp_path / "chipq"
    outdir.mkdir()
    (outdir / "preflight.json").write_text(json.dumps(preflight))
    env = dict(
        os.environ,
        REUSE_PREFLIGHT="1",  # gate on the fabricated verdicts above
        CHIPQ_NO_PROBE="1",
        CHIPQ_QUEUE=queue_cmd,
    )
    p = subprocess.run(
        ["bash", os.path.join(REPO, "chip_queue3.sh"), str(outdir)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    recs = [
        json.loads(line)
        for line in (outdir / "results.jsonl").read_text().splitlines()
        if line.strip()
    ]
    return p, recs


def test_queue_skips_harness_whose_smoke_failed(tmp_path):
    p, recs = _run_queue(
        tmp_path,
        {"fake": {"ok": False, "seconds": 0.1, "detail": "injected"}},
        "run fake 60 echo chip-should-never-run",
    )
    assert any(
        r["harness"] == "fake" and r.get("skipped") == "preflight"
        for r in recs
    ), (recs, p.stderr)
    assert "SKIPPED" in p.stderr
    assert "chip-should-never-run" not in p.stdout


def test_queue_runs_harness_whose_smoke_passed(tmp_path):
    p, recs = _run_queue(
        tmp_path,
        {"fake": {"ok": True, "seconds": 0.1, "detail": ""}},
        'run fake 60 echo {\\"x\\":1}',
    )
    rec = next(r for r in recs if r["harness"] == "fake")
    assert rec.get("skipped") is None
    assert rec["result"] == {"x": 1}, (recs, p.stderr)


def test_queue_treats_missing_verdict_as_failed(tmp_path):
    """A harness with NO pre-flight row must not run — the queue list and
    chip_preflight.SMOKES drifting apart should fail safe."""
    p, recs = _run_queue(
        tmp_path,
        {},  # no verdicts at all
        "run unheard-of 60 echo nope",
    )
    assert any(
        r["harness"] == "unheard-of" and r.get("skipped") == "preflight"
        for r in recs
    ), (recs, p.stderr)


def test_every_queued_harness_has_a_smoke():
    """chip_queue3.sh's default queue list must stay a subset of
    chip_preflight.SMOKES (a queued harness with no smoke row is always
    skipped — catch the drift in CI, not on the chip)."""
    sys.path.insert(0, REPO)
    try:
        import chip_preflight
    finally:
        sys.path.pop(0)
    script = open(os.path.join(REPO, "chip_queue3.sh")).read()
    # the default --only list names the queued harnesses
    for line in script.splitlines():
        line = line.strip()
        if line.startswith("--only \"${PREFLIGHT_ONLY:-"):
            names = line.split(":-", 1)[1].rstrip("}\" \\").split(",")
            break
    else:
        raise AssertionError("default --only list not found in chip_queue3.sh")
    missing = [n for n in names if n not in chip_preflight.SMOKES]
    assert not missing, f"queued harnesses with no CPU smoke: {missing}"
    # the queue's actual pass1 run-list must ALSO be covered by the
    # --only list: a queued harness absent from the pre-flight list gets
    # NO verdict row and ok() fails safe — it would be silently skipped
    # on the chip with CI green (the drift the gate exists to catch)
    import re

    queued = set(re.findall(r"^\s*run (\w+)\s", script, re.M))
    queued |= set(re.findall(r"&& pscatter_aot.*\n\s*run (\w+)\s", script))
    queued.discard("fake")  # doc examples
    uncovered = [n for n in sorted(queued) if n not in names]
    assert not uncovered, (
        f"pass1 runs harnesses missing from the pre-flight --only list "
        f"(they would always be skipped): {uncovered}"
    )
