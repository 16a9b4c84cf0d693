#!/usr/bin/env bash
# Static checks + tests, the analogue of the reference's run_checks.sh
# (reference run_checks.sh:30-33: ruff format, ruff lint, pyright, pytest).
#
# The build image has no third-party linters, so the lint/format gate is
# the from-scratch checker in scripts/lint.py (pyflakes-grade: unused
# imports, redefinitions, ==None/==True, bare except, mutable defaults,
# line length, whitespace hygiene). CI environments with real ruff +
# pyright additionally run them via .github/workflows/checks.yml.
#
# Usage:
#   ./run_checks.sh          # static checks + full test suite
#   ./run_checks.sh --fast   # static checks only (seconds, no TPU/JAX)
set -u
cd "$(dirname "$0")"
status=0

step() {
    echo "=== $1 ==="
    shift
    "$@" || status=1
}

step "lint (scripts/lint.py)" python scripts/lint.py
step "syntax (compileall)" python -m compileall -q \
    planetmapper_tpu tests scripts bench.py __graft_entry__.py
step "api docs drift" python scripts/generate_api_docs.py --check

if [[ "${1:-}" != "--fast" ]]; then
    step "tests" bash tests/run_tests.sh

    # Hardware gate: when a TPU is reachable, also run the Mosaic-kernel
    # test suite on it (EFT grade, full-plane Pallas-vs-XLA parity, the
    # Pallas map evaluator, sharded-kernel selection). These auto-skip
    # on CPU, so without this step a regression in the *product default*
    # TPU path could land green.
    if python - <<'PY'
import sys
try:
    import jax
    sys.exit(0 if jax.default_backend() not in ('cpu',) else 1)
except Exception:
    sys.exit(1)
PY
    then
        step "tpu kernel tests" env PLANETMAPPER_TPU_TEST_BACKEND=tpu \
            python -m pytest tests/test_pallas_core.py -q
    else
        echo "=== tpu kernel tests: skipped (no TPU backend) ==="
    fi
fi

if [[ $status -eq 0 ]]; then
    echo "All checks passed."
else
    echo "CHECKS FAILED" >&2
fi
exit $status
