#!/usr/bin/env bash
# One-shot post-outage measurement sequence: probe the TPU, then (in
# order) time the fused pipeline, run the official bench, and prewarm
# the standard shape buckets so the persistent cache is warm for the
# driver. Exits 2 immediately if the TPU does not respond to a probe.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "== probe =="
# assert the axon (TPU) backend specifically - a CPU fallback passing
# the probe would silently time the wrong hardware
if ! timeout 180 python -c "import jax, jax.numpy as jnp; \
assert jax.default_backend() not in ('cpu',), jax.default_backend(); \
print('probe ok', jax.devices()[0], \
float(jax.jit(lambda v: v.sum())(jnp.arange(4.))))" \
        2>/dev/null | grep -q 'probe ok'; then
    echo "TPU not responding"; exit 2
fi

echo "== sweep (pivoted pipeline) =="
timeout 1800 python -u scripts/sweep_pipeline.py 2>&1 | tail -1

echo "== bench =="
timeout 3000 python bench.py 2>/tmp/bench_recover.err

echo "== prewarm 2048 (cache warm for driver) =="
timeout 1200 python -m planetmapper_tpu --prewarm 2048 2>&1 | tail -3
