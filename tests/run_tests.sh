#!/usr/bin/env bash
# Robust test runner: one pytest process per test file.
#
# Rationale: a single process accumulating every jitted program in the
# suite had (rarely) crashed XLA:CPU late in full runs on an earlier jax
# build. On jax 0.9 the crash no longer reproduces: single-process
# `python -m pytest tests/ -q` passed 3x consecutively (2026-08-17,
# 288 tests, ~10.5 min each) with the conftest clearing jax caches
# between modules. Per-file processes are kept as the belt-and-braces CI
# entry point: they bound accumulated state while the persistent
# compilation cache keeps total wall time close to single-process.
set -u
cd "$(dirname "$0")/.."
status=0
for f in tests/test_*.py; do
    echo "=== $f ==="
    python -m pytest "$f" -q "$@" || status=1
done
exit $status
