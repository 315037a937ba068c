"""Sharded test runner: one pytest subprocess per test file.

`python -m pytest tests/ -q` accumulates per-process compile state in
jaxlib's CPU compiler and segfaults reproducibly deep into the suite
(observed at test 94/106 inside backend_compile_and_load; every test passes
when the suite is run in pieces). This runner restores the one-command
contract by giving each test FILE a fresh process, two files in flight at a
time (the host has 2 cores).

Usage:
    python tools/run_tests.py          # fast suite (-m "not slow")
    python tools/run_tests.py --all    # full suite, every test
    python tools/run_tests.py tests/test_foo.py [...]   # subset, still sharded

Exits 0 iff every shard exits 0 (or 5 = "no tests collected", which a
deselected-everything fast shard legitimately produces). Prints one summary
line per file and an aggregate tail.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUMMARY_RE = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) failed)?(?:, )?(?:(\d+) error)?"
)


def run_file(path: str, extra: list[str]) -> tuple[str, int, float, str]:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", *extra],
        cwd=ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    wall = time.perf_counter() - t0
    tail = proc.stdout.strip().splitlines()
    summary = tail[-1] if tail else ""
    return path, proc.returncode, wall, summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="test files (default: tests/test_*.py)")
    ap.add_argument("--all", action="store_true", help="include slow tests")
    ap.add_argument("-j", type=int, default=2, help="concurrent shards")
    ap.add_argument("-k", default=None, help="forwarded pytest -k expression")
    args = ap.parse_args()

    files = args.files or sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    extra = [] if args.all else ["-m", "not slow"]
    if args.k:
        extra += ["-k", args.k]

    results: dict[str, tuple[int, float, str]] = {}
    lock = threading.Lock()
    queue = list(files)

    def worker():
        while True:
            with lock:
                if not queue:
                    return
                path = queue.pop(0)
            path_, rc, wall, summary = run_file(path, extra)
            with lock:
                results[path_] = (rc, wall, summary)
                status = "ok" if rc in (0, 5) else f"FAIL(rc={rc})"
                print(
                    f"[{len(results):2d}/{len(files)}] {status:>10s} "
                    f"{wall:7.1f}s  {os.path.basename(path_):40s} {summary}",
                    flush=True,
                )

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(max(1, args.j))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    bad = {p: r for p, r in results.items() if r[0] not in (0, 5)}
    passed = failed = 0
    for _, (_, _, summary) in results.items():
        m = re.search(r"(\d+) passed", summary)
        passed += int(m.group(1)) if m else 0
        m = re.search(r"(\d+) failed", summary)
        failed += int(m.group(1)) if m else 0
    print(
        f"\n== {passed} passed, {failed} failed, "
        f"{len(bad)} bad shard(s), {wall:.0f}s total "
        f"({'full' if args.all else 'fast'} suite) ==",
        flush=True,
    )
    for p, (rc, _, summary) in sorted(bad.items()):
        print(f"  FAILED {p} (rc={rc}): {summary}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
