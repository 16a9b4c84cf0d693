"""
Generated API documentation stays in sync with the code.

The reference ships a Sphinx autodoc site whose pages (including the
default-backplanes table) are generated from the code; here
``scripts/generate_api_docs.py`` plays that role and this test is the
drift check: it regenerates the full ``docs/api/`` page set into a temp
dir and fails if the committed pages differ, or if any public symbol is
undocumented.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generated_api_docs_up_to_date():
    result = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, 'scripts',
                                      'generate_api_docs.py'), '--check'],
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'},
    )
    assert result.returncode == 0, (
        f'docs/api stale or incomplete:\n{result.stdout}\n{result.stderr}'
    )
