#!/usr/bin/env python3
"""
From-scratch static checks for the repository (no third-party linters are
available in the build image, so this implements the pyflakes/ruff-grade
checks the project relies on; `.github/workflows/checks.yml` additionally
runs real ruff + pyright in CI environments that have them).

Checks (all files):
    LINE  line longer than the limit (88)
    TABS  tab character in indentation
    EOL   trailing whitespace
    EOF   file does not end with exactly one newline
    CRLF  carriage return in source

AST checks (per module):
    F401  imported name never used (supports ``# noqa`` and __all__)
    F811  redefinition of a top-level function/class within one scope
    E711  comparison to None with == / !=
    E712  comparison to True / False with == / !=
    BARE  bare ``except:`` clause
    MUT   mutable default argument (list/dict/set literal)

Exit status 1 if any check fails. Usage: python scripts/lint.py [paths...]
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

LINE_LIMIT = 88

DEFAULT_PATHS = [
    'planetmapper_tpu',
    'tests',
    'scripts',
    'bench.py',
    '__graft_entry__.py',
]


def iter_py_files(paths: list[str]) -> list[Path]:
    out: list[Path] = []
    for p in paths:
        path = Path(p)
        if path.is_dir():
            out.extend(sorted(path.rglob('*.py')))
        elif path.suffix == '.py':
            out.append(path)
    return out


def check_text(path: Path, text: str, errors: list[str]) -> None:
    if '\r' in text:
        errors.append(f'{path}: CRLF carriage return in source')
    lines = text.split('\n')
    for i, line in enumerate(lines, 1):
        if len(line) > LINE_LIMIT and 'noqa' not in line:
            errors.append(
                f'{path}:{i}: LINE too long ({len(line)} > {LINE_LIMIT})'
            )
        if line != line.rstrip():
            errors.append(f'{path}:{i}: EOL trailing whitespace')
        stripped = line.lstrip(' ')
        if stripped.startswith('\t'):
            errors.append(f'{path}:{i}: TABS tab in indentation')
    if text and not text.endswith('\n'):
        errors.append(f'{path}: EOF missing final newline')


class _ImportVisitor(ast.NodeVisitor):
    """Collect import bindings and every identifier that is read."""

    def __init__(self) -> None:
        self.imports: list[tuple[int, str, str]] = []  # (line, asname, src)
        self.used: set[str] = set()
        self.all_names: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            name = alias.asname or alias.name.split('.')[0]
            self.imports.append((node.lineno, name, alias.name))

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == '__future__':
            return
        for alias in node.names:
            if alias.name == '*':
                continue
            name = alias.asname or alias.name
            self.imports.append((node.lineno, name, alias.name))

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)

    def visit_Assign(self, node: ast.Assign) -> None:
        # __all__ entries count as uses (re-export surface)
        for t in node.targets:
            if isinstance(t, ast.Name) and t.id == '__all__':
                for elt in ast.walk(node.value):
                    if isinstance(elt, ast.Constant) and isinstance(
                        elt.value, str
                    ):
                        self.all_names.add(elt.value)
        self.generic_visit(node)


def _noqa_lines(text: str) -> set[int]:
    return {
        i
        for i, line in enumerate(text.split('\n'), 1)
        if 'noqa' in line.split('#', 1)[-1] and '#' in line
    }


def check_ast(path: Path, text: str, errors: list[str]) -> None:
    try:
        tree = ast.parse(text)
    except SyntaxError as exc:
        errors.append(f'{path}:{exc.lineno}: SYNTAX {exc.msg}')
        return
    noqa = _noqa_lines(text)

    visitor = _ImportVisitor()
    visitor.visit(tree)
    for lineno, name, src in visitor.imports:
        if lineno in noqa or name.startswith('_'):
            continue
        if name in visitor.used or name in visitor.all_names:
            continue
        errors.append(f'{path}:{lineno}: F401 {src!r} imported but unused')

    # F811: same-name defs in one scope (decorated redefinitions like
    # @property/@x.setter pairs are fine - detect undecorated ones only)
    for scope in ast.walk(tree):
        if not isinstance(
            scope, (ast.Module, ast.ClassDef, ast.FunctionDef,
                    ast.AsyncFunctionDef)
        ):
            continue
        seen: dict[str, int] = {}
        for stmt in getattr(scope, 'body', []):
            if isinstance(
                stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                if stmt.name in seen and not getattr(
                    stmt, 'decorator_list', None
                ):
                    if stmt.lineno not in noqa:
                        errors.append(
                            f'{path}:{stmt.lineno}: F811 redefinition of '
                            f'{stmt.name!r} (first at line '
                            f'{seen[stmt.name]})'
                        )
                seen.setdefault(stmt.name, stmt.lineno)

    for node in ast.walk(tree):
        if isinstance(node, ast.Compare) and node.lineno not in noqa:
            for op, comparator in zip(node.ops, node.comparators):
                if not isinstance(op, (ast.Eq, ast.NotEq)):
                    continue
                if isinstance(comparator, ast.Constant):
                    if comparator.value is None:
                        errors.append(
                            f'{path}:{node.lineno}: E711 comparison to '
                            f'None (use `is`)'
                        )
                    elif comparator.value is True or (
                        comparator.value is False
                    ):
                        errors.append(
                            f'{path}:{node.lineno}: E712 comparison to '
                            f'{comparator.value} (use `is` or truthiness)'
                        )
        elif isinstance(node, ast.ExceptHandler):
            if node.type is None and node.lineno not in noqa:
                errors.append(f'{path}:{node.lineno}: BARE bare except')
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            defaults = list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]
            for d in defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)) and (
                    d.lineno not in noqa
                ):
                    errors.append(
                        f'{path}:{d.lineno}: MUT mutable default argument '
                        f'in {node.name!r}'
                    )


def main(argv: list[str]) -> int:
    paths = argv[1:] or DEFAULT_PATHS
    root = Path(__file__).resolve().parent.parent
    errors: list[str] = []
    files = iter_py_files([str(root / p) for p in paths])
    for f in files:
        text = f.read_text(encoding='utf-8')
        rel = f.relative_to(root)
        check_text(rel, text, errors)
        check_ast(rel, text, errors)
    for e in errors:
        print(e)
    print(
        f'lint: {len(files)} files checked, {len(errors)} error(s)',
        file=sys.stderr,
    )
    return 1 if errors else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
