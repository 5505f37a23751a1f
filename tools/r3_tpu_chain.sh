#!/bin/bash
# Round-3 TPU measurement chain: run serially (one chip).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== bench 4 envs (default rgb+seg) ==="
python bench.py 2>&1 | tail -2
echo "=== solution stats (all 7 tasks, 5 seeds) ==="
python tools/solution_stats.py --seeds 5 --out /tmp/solutions_r3.json 2>&1 | grep -v WARNING
echo "=== bench 16 envs ==="
BENCH_NUM_ENVS=16 python bench.py 2>&1 | tail -1
echo "=== bench 1 env ==="
BENCH_NUM_ENVS=1 python bench.py 2>&1 | tail -1
echo "=== CHAIN DONE ==="
