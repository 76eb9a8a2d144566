#!/usr/bin/env python
"""Static analysis for the Python tree (the reference CI's cppcheck stage
analog, .gitlab-ci.yml:92; no third-party linters are available in this
image, so this is a focused AST linter).

Checks:
  W1 unused import            W4 mutable default argument
  W2 bare except              W5 comparison with == None / != None
  W3 redefinition in scope    W6 f-string without placeholders

Usage: python scripts/pylint_lite.py [paths...]   (default: package + tests)
Exits 1 on any finding.
"""

from __future__ import annotations

import ast
import os
import sys


class _Lint(ast.NodeVisitor):
    def __init__(self, path: str):
        self.path = path
        self.findings: list[tuple[int, str, str]] = []
        self.imported: dict[str, int] = {}
        self.used: set[str] = set()

    def add(self, node, code, msg):
        self.findings.append((node.lineno, code, msg))

    # --- imports / usage -------------------------------------------------
    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported.setdefault(name, node.lineno)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imported.setdefault(a.asname or a.name, node.lineno)

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    # --- other checks ----------------------------------------------------
    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.add(node, "W2", "bare except")
        self.generic_visit(node)

    def _check_defaults(self, node):
        for d in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.add(d, "W4", "mutable default argument")
        self.generic_visit(node)

    visit_FunctionDef = _check_defaults
    visit_AsyncFunctionDef = _check_defaults

    def visit_Compare(self, node):
        for op, cmp_ in zip(node.ops, node.comparators):
            if (isinstance(op, (ast.Eq, ast.NotEq))
                    and isinstance(cmp_, ast.Constant)
                    and cmp_.value is None):
                self.add(node, "W5", "comparison with ==/!= None "
                                     "(use is/is not)")
        self.generic_visit(node)

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.add(node, "W6", "f-string without placeholders")
        # Visit only embedded values; a format_spec is itself a JoinedStr
        # (e.g. ':.1f') and must not trip W6.
        for v in node.values:
            if isinstance(v, ast.FormattedValue):
                self.visit(v.value)


def _scope_redefs(tree, lint):
    """W3: same name bound twice by def/class at the same scope level."""
    def walk(body, scope):
        seen: dict[str, int] = {}
        for stmt in body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                deco = {ast.unparse(d) for d in stmt.decorator_list}
                overloadish = any("overload" in d or "setter" in d
                                  or "getter" in d or "register" in d
                                  for d in deco)
                if stmt.name in seen and not overloadish:
                    lint.findings.append(
                        (stmt.lineno, "W3",
                         f"redefinition of {stmt.name!r} "
                         f"(first at line {seen[stmt.name]})"))
                seen[stmt.name] = stmt.lineno
                walk(stmt.body, scope + 1)
    walk(tree.body, 0)


def lint_file(path: str) -> list[str]:
    with open(path, "rb") as f:
        src = f.read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E0 syntax error: {e.msg}"]
    lint = _Lint(path)
    lint.visit(tree)
    _scope_redefs(tree, lint)
    # Unused imports: a module-level binding never loaded anywhere in the
    # file (conservative: any Load of the name counts, any scope).
    dunder_all = set()
    for stmt in tree.body:
        if (isinstance(stmt, ast.Assign) and len(stmt.targets) == 1
                and isinstance(stmt.targets[0], ast.Name)
                and stmt.targets[0].id == "__all__"
                and isinstance(stmt.value, (ast.List, ast.Tuple))):
            dunder_all = {e.value for e in stmt.value.elts
                          if isinstance(e, ast.Constant)}
    is_init = os.path.basename(path) == "__init__.py"
    for name, lineno in lint.imported.items():
        if name in lint.used or name in dunder_all or name.startswith("_"):
            continue
        if is_init:
            continue  # re-export surface
        lint.findings.append((lineno, "W1", f"unused import {name!r}"))
    return [f"{path}:{ln}: {code} {msg}"
            for ln, code, msg in sorted(lint.findings)]


def main(argv):
    roots = argv or ["psk_soft_tpu", "tests", "bench.py",
                     "__graft_entry__.py", "scripts"]
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = []
    for r in roots:
        p = os.path.join(base, r)
        if os.path.isfile(p):
            files.append(p)
        else:
            for dirpath, _, names in os.walk(p):
                files.extend(os.path.join(dirpath, n) for n in names
                             if n.endswith(".py"))
    findings = []
    for f in sorted(files):
        findings.extend(lint_file(f))
    for line in findings:
        print(line)
    print(f"pylint_lite: {len(files)} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
