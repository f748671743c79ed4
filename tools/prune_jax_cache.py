"""Size budget + regeneration for the committed XLA compile cache
(VERDICT r4 next #8).

`.jax_cache/` is committed so the driver's multichip dryrun loads the
pre-warmed CPU executable in seconds instead of recompiling ~7 min
(see __graft_entry__._respawn_on_cpu_mesh). Entries are keyed to the
exact jax/XLA build and to the compiled graph, so toolchain bumps and
train-step changes strand dead blobs; this tool keeps the directory
honest:

  python tools/prune_jax_cache.py            # check: fail loudly > budget
  python tools/prune_jax_cache.py --regen    # delete + rebuild from the
                                             # dryrun, print the new size

The budget (10 MB) is also enforced by tests/test_utils.py's
test_jax_cache_size_budget so silent growth fails CI, not a future
archaeology session.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

BUDGET_BYTES = 10 * 1024 * 1024
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def cache_size() -> int:
    total = 0
    for root, _, files in os.walk(CACHE):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--regen", action="store_true",
                   help="delete the cache and re-warm it from the "
                        "multichip dryrun (the one consumer that needs "
                        "committed warm entries)")
    p.add_argument("--budget-mb", type=float, default=BUDGET_BYTES / 2**20)
    args = p.parse_args()
    budget = int(args.budget_mb * 2**20)

    if args.regen:
        if os.path.isdir(CACHE):
            shutil.rmtree(CACHE)
        env = dict(os.environ)
        env.pop("JAX_COMPILATION_CACHE_DIR", None)  # dryrun sets its own
        subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            cwd=REPO, env=env, check=True)

    size = cache_size()
    n = sum(len(fs) for _, _, fs in os.walk(CACHE))
    print(f".jax_cache: {size / 2**20:.2f} MB in {n} entries "
          f"(budget {budget / 2**20:.0f} MB)")
    if size > budget:
        print("OVER BUDGET — run `python tools/prune_jax_cache.py "
              "--regen` and commit the refreshed entries", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
