"""Run the test suite one file per pytest process.

Why: this VM migrates between heterogeneous physical CPUs (XLA:CPU logs
"machine type used for compilation doesn't match the machine type for
execution ... could lead to SIGILL"), and a single long pytest process
reproducibly dies with Fatal aborts/segfaults inside
`backend_compile_and_load` ~20 minutes in — on whatever test happens to
be compiling at migration time (observed at test_multi_session,
test_parallel, test_optim across runs; every one of them passes in
isolation). A fresh process per file re-JITs for the CPU it lands on.

Usage: python tools/run_suite.py [pytest-args...]
Exit code 0 iff every file passes.
"""

import glob
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    extra = [a for a in sys.argv[1:]]
    failures = []
    t_all = time.time()
    for f in files:
        name = os.path.basename(f)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", f, "-q"] + extra,
            cwd=ROOT, capture_output=True, text=True, timeout=1800)
        dt = time.time() - t0
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        status = "ok" if r.returncode == 0 else f"FAIL rc={r.returncode}"
        print(f"{name:36s} {dt:6.1f}s  {status}  {tail}", flush=True)
        if r.returncode != 0:
            failures.append(name)
            sys.stdout.write(r.stdout[-3000:])
            sys.stdout.write(r.stderr[-2000:])
    print(f"\ntotal {time.time() - t_all:.0f}s; "
          f"{len(files) - len(failures)}/{len(files)} files green"
          + (f"; FAILED: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
