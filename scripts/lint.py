#!/usr/bin/env python
"""Minimal AST lint gate (no pylint/flake8 in this image).

Checks nums_tpu/ for: syntax errors, unused imports, bare `except:`,
mutable default arguments, and f-strings with no placeholders. Exit 1 on
any finding — the lint half of the reference's `pytest --pylint` CI.
"""

import ast
import sys
from pathlib import Path

ALLOW_UNUSED = {
    # Re-exports and import-for-side-effect are part of module APIs.
    "__init__.py",
}


def check_file(path: Path):
    src = path.read_text()
    problems = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    # format_spec of f"{x:.1f}" is itself a constant-only JoinedStr; skip.
    spec_ids = {
        id(n.format_spec)
        for n in ast.walk(tree)
        if isinstance(n, ast.FormattedValue) and n.format_spec is not None
    }

    imported = {}  # name -> lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare except")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{node.lineno}: mutable default argument "
                        f"in {node.name}()"
                    )
        elif isinstance(node, ast.JoinedStr):
            if id(node) not in spec_ids and not any(
                isinstance(v, ast.FormattedValue) for v in node.values
            ):
                problems.append(
                    f"{path}:{node.lineno}: f-string without placeholders"
                )

    if path.name not in ALLOW_UNUSED:
        used = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                base = node
                while isinstance(base, ast.Attribute):
                    base = base.value
                if isinstance(base, ast.Name):
                    used.add(base.id)
        # Names in __all__ / docstring references don't parse as Name
        # nodes; treat string constants mentioning the name as use.
        strings = {
            n.value
            for n in ast.walk(tree)
            if isinstance(n, ast.Constant) and isinstance(n.value, str)
        }
        for name, lineno in imported.items():
            if name in used or name == "annotations":
                continue
            if any(name in s for s in strings):
                continue
            problems.append(f"{path}:{lineno}: unused import '{name}'")
    return problems


def main():
    roots = sys.argv[1:] or ["nums_tpu"]
    problems = []
    for root in roots:
        for path in sorted(Path(root).rglob("*.py")):
            problems.extend(check_file(path))
    for p in problems:
        print(p)
    print(f"lint: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
