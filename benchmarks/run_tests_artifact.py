"""Per-round test-verification artifact (VERDICT r3 item 8 / SURVEY §4.7).

Runs the three suites — the fast CPU suite, the slow statistical suite
(NBLDPC_SLOW_TESTS=1), and the on-device TPU suite (NBLDPC_TPU_TESTS=1,
-m tpu) — each in its own subprocess, and writes
benchmarks/results/tests_<tag>.json with pass/fail/skip counts, wall
times and the git SHA, so every round records WHEN the full pyramid
last ran and at which commit.

The suites run SEQUENTIALLY (2-core box; the TPU runtime is
single-client). Usage: python benchmarks/run_tests_artifact.py [--tag r4]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_suite(name: str, args: list, env_extra: dict, timeout: int) -> dict:
    env = dict(os.environ, **env_extra)
    xml = REPO / "benchmarks" / "results" / f".tests_{name}.xml"
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *args,
             f"--junitxml={xml}"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=timeout,
        )
        out = proc.stdout + proc.stderr
        rc = proc.returncode
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or "") + (e.stderr or "")
        rc = -1
    wall = round(time.time() - t0, 1)
    # junitxml is written before interpreter exit, so it survives the
    # pytest-exits-without-summary quirk this box shows (atexit crash)
    counts = {}
    if xml.exists():
        import xml.etree.ElementTree as ET

        suite = ET.parse(xml).getroot().find("testsuite")
        a = suite.attrib
        total = int(a.get("tests", 0))
        err = int(a.get("errors", 0))
        fail = int(a.get("failures", 0))
        skip = int(a.get("skipped", 0))
        counts = {"passed": total - err - fail - skip, "failed": fail,
                  "errors": err, "skipped": skip}
        xml.unlink()
    else:
        for num, word in re.findall(
                r"(\d+) (passed|failed|skipped|error)", out):
            counts[word] = counts.get(word, 0) + int(num)
    rec = {"suite": name, "rc": rc, "wall_s": wall, **counts}
    if rc not in (0, 5) and not counts.get("failed"):
        rec["tail"] = out[-1500:]
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r4")
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    suites = [
        ("fast_cpu", ["tests/", "-q"], {}, 2400),
        ("slow_cpu", ["tests/", "-q", "-m", "slow"],
         {"NBLDPC_SLOW_TESTS": "1"}, 3600),
    ]
    if not args.skip_tpu:
        suites.append(
            ("tpu_device", ["tests/", "-q", "-m", "tpu"],
             {"NBLDPC_TPU_TESTS": "1"}, 3600))

    records = [run_suite(*s) for s in suites]
    out = {
        "git_sha": sha,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "suites": records,
        "all_green": all(
            r["rc"] in (0, 5) and not r.get("failed") and
            not r.get("errors") for r in records),
    }
    outdir = REPO / "benchmarks" / "results"
    outdir.mkdir(exist_ok=True)
    (outdir / f"tests_{args.tag}.json").write_text(json.dumps(out, indent=2))
    print(json.dumps({"all_green": out["all_green"],
                      "file": f"tests_{args.tag}.json"}), flush=True)


if __name__ == "__main__":
    main()
