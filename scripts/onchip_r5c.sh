#!/bin/sh
# Round-5 on-chip batch #3: full tpu_check (now 25 stages — ramped
# subyear chunk-invariance added) + a bench.py spot for the round-end
# health signal. Run in background; never timeout-kill.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== tpu_check (25 stages) ==="
python scripts/tpu_check.py
echo "tpu_check rc=$?"

echo "=== bench.py spot (det headline) ==="
python bench.py
echo "bench rc=$?"
