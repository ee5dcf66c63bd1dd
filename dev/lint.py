#!/usr/bin/env python
"""Self-contained repo linter (no flake8/black in this container).

Reference analog: /root/reference/dev/linter.sh (isort/black/flake8). This
container ships none of those, so the checks are implemented directly:

  * syntax: every .py must compile (ast.parse);
  * unused imports (module-level, AST-walk; ``# noqa`` opt-out);
  * tabs in indentation, trailing whitespace, CRLF line endings;
  * files missing a module docstring under drn_wsod_tpu/ (public package);
  * ``print(`` in library code (drn_wsod_tpu/) outside utils/logger —
    library output must go through the logger (tools/tests exempt).

Exit 0 = clean; 1 = findings (printed as path:line: message).
"""

import ast
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
        if isinstance(node, ast.Name):
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


def check_file(path):
    src = path.read_text()
    lines = src.splitlines()
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        note(path, e.lineno or 0, f"syntax error: {e.msg}")
        return
    unused_imports(tree, lines, path)
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
