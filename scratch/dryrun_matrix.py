"""Run dryrun_multichip under varied XLA:CPU configurations (round 5).

VERDICT round-4 item 1's 'done' criterion asks that the multichip
bit-equality dryrun hold under at least two different XLA:CPU fusion
contexts — the round-4 RED artifact passed in the builder/judge sessions
but failed in the driver environment (4 cores), because a runtime
`x / d_max` compiled differently (reciprocal rewrite) in the sharded vs
unsharded programs there.  After the ops.to_unit fix there is no
division left for the simplifier to treat context-dependently.

Each row spawns a fresh interpreter with a distinct environment:
  * device counts 8 / 4 / 2 (different mesh factorizations and
    program partitionings);
  * a 4-core affinity run (taskset 0-3) mimicking the driver host;
  * the thunk-runtime toggle (two different XLA:CPU codegen/fusion
    pipelines);
  * optimization level 1 (different simplifier pass mix).

Usage: python scratch/dryrun_matrix.py   (prints one PASS/FAIL per row).
"""

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_FLAGS = "--xla_force_host_platform_device_count={n}"

ROWS = [
    ("8dev", 8, "", None),
    ("4dev", 4, "", None),
    ("2dev", 2, "", None),
    ("8dev_4cores", 8, "", "0-3"),
    ("8dev_nothunks", 8, " --xla_cpu_use_thunk_runtime=false", None),
    ("8dev_opt1", 8, " --xla_backend_optimization_level=1", None),
]


def main():
    failures = []
    for name, n, extra, cores in ROWS:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = BASE_FLAGS.format(n=n) + extra
        cmd = [sys.executable, "-c",
               f"from __graft_entry__ import dryrun_multichip; "
               f"dryrun_multichip({n})"]
        if cores is not None and shutil.which("taskset"):
            cmd = ["taskset", "-c", cores] + cmd
        r = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True,
                           text=True, timeout=1200)
        ok = r.returncode == 0
        print(f"{'PASS' if ok else 'FAIL'} {name}: rc={r.returncode}")
        if not ok:
            print(r.stdout[-1500:])
            print(r.stderr[-1500:])
            failures.append(name)
    if failures:
        sys.exit(f"dryrun matrix failures: {failures}")
    print(f"dryrun matrix: all {len(ROWS)} configurations bit-equal")


if __name__ == "__main__":
    main()
