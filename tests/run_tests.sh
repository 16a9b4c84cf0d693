#!/usr/bin/env bash
# Robust test runner: one pytest process per test file.
#
# Rationale: a single process accumulating every jitted program in the
# suite has (rarely) crashed XLA:CPU late in full runs; per-file processes
# bound the accumulated state while keeping the persistent compilation
# cache warm, so the total wall time stays close to the single-process run.
# `python -m pytest tests/ -q` also works (the conftest clears jax caches
# between modules) - this script is the belt-and-braces CI entry point.
set -u
cd "$(dirname "$0")/.."
status=0
for f in tests/test_*.py; do
    echo "=== $f ==="
    python -m pytest "$f" -q "$@" || status=1
done
exit $status
