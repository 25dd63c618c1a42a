"""Self-contained lint (the environment ships no external linters —
the reference's analog is cpplint + -Weverything, Makefile.dev:1-5).

Checks every tracked Python source for:
  * syntax errors (ast parse)
  * unused imports (module scope)
  * tabs in indentation, trailing whitespace
  * accidental breakpoints / pdb imports / print-debugging markers
Exit code 1 on any finding. Run: python tools/lint.py [paths...]
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
DEFAULT_PATHS = ["nanort_tpu", "tests", "examples",
                 "bench.py", "bench_matrix.py", "__graft_entry__.py"]
# tools/ carries measurement one-offs (tools/experiments especially) that
# keep exploratory imports; lint the package + tests + entry points
# names whose import is a re-export or side-effect registration
EXPORT_FILES = {"__init__.py"}


def check_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    problems = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    for i, line in enumerate(src.splitlines(), 1):
        if line.rstrip() != line:
            problems.append(f"{path}:{i}: trailing whitespace")
        if line.startswith("\t"):
            problems.append(f"{path}:{i}: tab indentation")

    if path.name not in EXPORT_FILES:
        imported: dict[str, int] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                continue
            if isinstance(node, ast.Import):
                for a in node.names:
                    imported[(a.asname or a.name).split(".")[0]] = node.lineno
            elif isinstance(node, ast.ImportFrom):
                for a in node.names:
                    if a.name == "*":
                        continue
                    imported[a.asname or a.name] = node.lineno
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
        # names referenced in __all__ strings or noqa'd lines count as used
        noqa_lines = {
            i for i, l in enumerate(src.splitlines(), 1) if "noqa" in l
        }
        for name, lineno in sorted(imported.items()):
            if name not in used and lineno not in noqa_lines:
                problems.append(f"{path}:{lineno}: unused import '{name}'")

    for node in ast.walk(tree):
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            if node.func.id == "breakpoint":
                problems.append(f"{path}:{node.lineno}: breakpoint() left in")
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            mods = [a.name for a in node.names]
            if "pdb" in mods or getattr(node, "module", "") == "pdb":
                problems.append(f"{path}:{node.lineno}: pdb import left in")
    return problems


def main(argv):
    targets = argv[1:] or DEFAULT_PATHS
    files: list[pathlib.Path] = []
    for t in targets:
        p = ROOT / t
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    problems = []
    for f in files:
        problems.extend(check_file(f))
    for p in problems:
        print(p)
    print(f"lint: {len(files)} files, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
