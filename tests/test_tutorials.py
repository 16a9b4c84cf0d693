"""
Tutorial pages stay executable: every ```python block in each
docs/tutorials/*.md page runs verbatim, in order, in one namespace per
page (the reference ships long-form worked examples in its Sphinx docs;
these are the equivalent, kept honest by execution instead of review).
"""

from __future__ import annotations

import os
import re

import pytest

from common import setup_kernels

setup_kernels()

TUTORIAL_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'docs', 'tutorials',
)


def _pages():
    return sorted(
        f for f in os.listdir(TUTORIAL_DIR) if f.endswith('.md')
    )


def _code_blocks(path: str) -> list[str]:
    text = open(path).read()
    return re.findall(r'```python\n(.*?)```', text, flags=re.DOTALL)


def test_tutorials_exist():
    pages = _pages()
    assert len(pages) >= 3
    for page in pages:
        blocks = _code_blocks(os.path.join(TUTORIAL_DIR, page))
        assert len(blocks) >= 2, f'{page} has too few code blocks'


@pytest.mark.parametrize('page', _pages())
def test_tutorial_page_runs(page):
    path = os.path.join(TUTORIAL_DIR, page)
    namespace: dict = {'__name__': f'tutorial_{page}'}
    for i, block in enumerate(_code_blocks(path)):
        try:
            exec(compile(block, f'{page}[block {i}]', 'exec'), namespace)
        except Exception as exc:
            raise AssertionError(
                f'{page} code block {i} failed: {exc}\n---\n{block}'
            ) from exc
