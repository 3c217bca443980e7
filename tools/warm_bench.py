"""Prewarm the tunnel server's TPU compile cache for bench.py.

The axon runtime compiles lazily server-side at FIRST EXECUTION of a program
and caches the executable by HLO fingerprint across client processes
(measured: same toy program 1140 s -> 490 s -> 0.5 s over three fresh
processes — PERF.md round 3).  The driver runs ``python bench.py`` under a
hard wall-clock timeout every round; a cold 1080p fwd+bwd program can queue
behind other tenants for longer than that timeout, so the build round's LAST
step (after the hot-path code is frozen) must run bench once without a
deadline to populate the server cache.  Run it twice: there is evidence of
more than one load-balanced server replica, each with its own cache.

Usage:  python tools/warm_bench.py [n_runs]
"""
import os
import subprocess
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

env = dict(os.environ)
env["BENCH_DEADLINE_S"] = "100000"  # no deadline while warming
env.setdefault("BENCH_ITERS", "3")

for i in range(n_runs):
    t0 = time.time()
    r = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                       cwd=repo, env=env)
    print(f"# warm run {i + 1}/{n_runs}: rc={r.returncode} "
          f"{time.time() - t0:.0f}s", file=sys.stderr, flush=True)
