"""Regenerate benchmarks/cache_seed/ — the committed compilation-cache
entries that make a fresh checkout's first bench run warm.

Method: move the live .jax_cache aside, run bench.py with seeding
disabled (CANNY_BENCH_NO_SEED=1) so it recompiles and persists exactly
the entries it needs, copy those into benchmarks/cache_seed/, then merge
the old cache back.  Run on the real TPU (the seed is only useful for
the platform the driver benches on); takes however long the cold
compiles take (~5-15 min on the axon tunnel).

Usage:  python benchmarks/refresh_cache_seed.py
"""

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".jax_cache")
SEED = os.path.join(ROOT, "benchmarks", "cache_seed")
ASIDE = CACHE + ".aside"


def main():
    if os.path.isdir(ASIDE):
        raise SystemExit(f"stale {ASIDE} exists — merge or remove it first")
    if os.path.isdir(CACHE):
        os.rename(CACHE, ASIDE)
    try:
        env = dict(os.environ, CANNY_BENCH_NO_SEED="1")
        rc = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                            env=env, cwd=ROOT).returncode
        if rc != 0:
            raise SystemExit(f"bench.py failed (rc={rc}); cache left as-is")
        os.makedirs(SEED, exist_ok=True)
        for stale in os.listdir(SEED):
            os.remove(os.path.join(SEED, stale))
        n = 0
        for name in os.listdir(CACHE) if os.path.isdir(CACHE) else []:
            shutil.copy2(os.path.join(CACHE, name),
                         os.path.join(SEED, name))
            n += 1
        print(f"cache_seed refreshed: {n} entries, "
              f"{sum(os.path.getsize(os.path.join(SEED, f)) for f in os.listdir(SEED)) / 1e6:.1f} MB")
    finally:
        # merge the pre-existing cache back (fresh entries win)
        if os.path.isdir(ASIDE):
            os.makedirs(CACHE, exist_ok=True)
            for name in os.listdir(ASIDE):
                dst = os.path.join(CACHE, name)
                if not os.path.exists(dst):
                    os.rename(os.path.join(ASIDE, name), dst)
                else:
                    os.remove(os.path.join(ASIDE, name))
            os.rmdir(ASIDE)


if __name__ == "__main__":
    main()
