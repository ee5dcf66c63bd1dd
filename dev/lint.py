#!/usr/bin/env python
"""Self-contained repo linter (no flake8/black in this container).

Reference analog: /root/reference/dev/linter.sh (isort/black/flake8). This
container ships none of those, so the checks are implemented directly:

  * syntax: every .py must compile (ast.parse);
  * unused imports (module-level, AST-walk; ``# noqa`` opt-out);
  * undefined names (flake8-F821 analog): Load-context names with no
    binding anywhere in the file and not a builtin — scope-unaware on
    purpose (collect-all-bindings), so it never false-positives on
    closures/comprehensions but still catches deleted-import NameErrors;
  * tabs in indentation, trailing whitespace, CRLF line endings;
  * files missing a module docstring under drn_wsod_tpu/ (public package);
  * ``print(`` in library code (drn_wsod_tpu/) outside utils/logger —
    library output must go through the logger (tools/tests exempt).

Exit 0 = clean; 1 = findings (printed as path:line: message).
"""

import ast
import builtins
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SCAN = ["drn_wsod_tpu", "tools", "tests", "dev", "demo"]
TOP = ["bench.py", "__graft_entry__.py"]

findings = []


def note(path, line, msg):
    findings.append(f"{path.relative_to(ROOT)}:{line}: {msg}")


def unused_imports(tree, src_lines, path):
    imported = {}  # name -> (line, is_noqa)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":  # future statement, not a binding
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    if not imported:
        return
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    # names re-exported via __all__ count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(
                                elt.value, str):
                            used.add(elt.value)
    for name, line in sorted(imported.items(), key=lambda kv: kv[1]):
        if name in used:
            continue
        txt = src_lines[line - 1] if line <= len(src_lines) else ""
        if "noqa" in txt:
            continue
        if path.name == "__init__.py":  # re-export surface
            continue
        note(path, line, f"unused import '{name}'")


_BUILTIN_NAMES = set(dir(builtins)) | {
    "__name__", "__file__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__path__", "__all__",
    "__annotations__", "__class__", "__dict__", "__module__",
    "__qualname__",
}


def _collect_bindings(tree):
    """Every name the file binds anywhere (scope-unaware superset)."""
    bound = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(
                node.ctx, (ast.Store, ast.Del)):
            bound.add(node.id)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                if a.name == "*":
                    return None  # star import: can't reason about names
                bound.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.arg):
            bound.add(node.arg)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            bound.update(node.names)
        elif isinstance(node, (ast.MatchAs, ast.MatchStar)):
            if getattr(node, "name", None):
                bound.add(node.name)
        elif isinstance(node, ast.MatchMapping) and node.rest:
            bound.add(node.rest)
    return bound


def undefined_names(tree, src_lines, path):
    """F821 analog: a Load-context Name with no binding anywhere in the
    file and not a builtin is a guaranteed NameError if reached."""
    bound = _collect_bindings(tree)
    if bound is None:
        return
    seen = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load)
                and node.id not in bound
                and node.id not in _BUILTIN_NAMES
                and node.id not in seen):
            txt = (src_lines[node.lineno - 1]
                   if node.lineno <= len(src_lines) else "")
            if "noqa" in txt:
                continue
            seen.add(node.id)
            note(path, node.lineno, f"undefined name '{node.id}'")


def check_file(path):
    try:
        src = path.read_text(errors="replace")
    except OSError as e:
        note(path, 0, f"unreadable: {e}")
        return
    lines = src.splitlines()
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        note(path, e.lineno or 0, f"syntax error: {e.msg}")
        return
    unused_imports(tree, lines, path)
    undefined_names(tree, lines, path)
    if "\r\n" in src:
        note(path, 1, "CRLF line endings")
    for i, ln in enumerate(lines, 1):
        if ln != ln.rstrip():
            note(path, i, "trailing whitespace")
        stripped_prefix = ln[:len(ln) - len(ln.lstrip())]
        if "\t" in stripped_prefix:
            note(path, i, "tab in indentation")
    rel = path.relative_to(ROOT).as_posix()
    if rel.startswith("drn_wsod_tpu/") and path.name != "__init__.py":
        if not (tree.body and isinstance(tree.body[0], ast.Expr)
                and isinstance(tree.body[0].value, ast.Constant)
                and isinstance(tree.body[0].value.value, str)):
            note(path, 1, "missing module docstring")
        if "logger" not in rel and "events" not in rel:
            for node in ast.walk(tree):
                if (isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Name)
                        and node.func.id == "print"
                        and "noqa" not in lines[node.lineno - 1]):
                    note(path, node.lineno,
                         "print() in library code (use the logger)")


def main():
    files = []
    for d in SCAN:
        files.extend(sorted((ROOT / d).rglob("*.py")))
    files.extend(ROOT / f for f in TOP)
    for f in files:
        if f.exists():
            check_file(f)
    for f in findings:
        print(f)
    print(f"lint: {len(findings)} finding(s) over {len(files)} files")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
