#!/usr/bin/env python
"""Line-coverage gate built on sys.monitoring (PEP 669) -- the reference
CI's gcov/gcovr stage analog (.gitlab-ci.yml:79-81,90-93) without
third-party packages.

Each (code object, line) event is disabled after its first hit, so the
steady-state overhead is near zero.  Executable lines are taken from the
compiled code objects' co_lines() tables, so the denominator is exact.

Usage:
  python scripts/pycov.py [--min PCT] [--report N] -m MODULE [args...]
  python scripts/pycov.py [--min PCT] SCRIPT [args...]

Coverage is measured for psk_soft_tpu/ only; subprocesses (CLI tests) are
not traced.  Exits 1 if total coverage < --min.
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys

TARGET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "psk_soft_tpu"))

covered: dict[str, set[int]] = {}
mon = sys.monitoring
TOOL = mon.COVERAGE_ID


def _cb(code, line):
    f = code.co_filename
    if f.startswith(TARGET):
        covered.setdefault(f, set()).add(line)
    return mon.DISABLE  # one hit per location is all we need


def _executable_lines(path: str) -> set[int]:
    with open(path, "rb") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for c in code.co_consts:
            if hasattr(c, "co_lines"):
                stack.append(c)
    return lines


def main():
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--min", type=float, default=0.0)
    ap.add_argument("--report", type=int, default=15,
                    help="show the N least-covered files")
    ap.add_argument("-m", dest="module")
    args, rest = ap.parse_known_args()

    # Launched as `python scripts/pycov.py`, sys.path[0] is scripts/; put
    # the repo root first so the package resolves like a cwd run.
    sys.path.insert(0, os.path.dirname(TARGET))

    mon.use_tool_id(TOOL, "pycov")
    mon.register_callback(TOOL, mon.events.LINE, _cb)
    mon.set_events(TOOL, mon.events.LINE)
    code = 0
    try:
        if args.module:
            sys.argv = [args.module] + rest
            runpy.run_module(args.module, run_name="__main__",
                             alter_sys=True)
        else:
            sys.argv = rest
            runpy.run_path(rest[0], run_name="__main__")
    except SystemExit as e:
        code = int(e.code or 0)
    finally:
        mon.set_events(TOOL, 0)

    rows = []
    tot_exec = tot_cov = 0
    for dirpath, _, names in os.walk(TARGET):
        for n in sorted(names):
            if not n.endswith(".py"):
                continue
            p = os.path.join(dirpath, n)
            ex = _executable_lines(p)
            cv = covered.get(p, set()) & ex
            tot_exec += len(ex)
            tot_cov += len(cv)
            pct = 100.0 * len(cv) / len(ex) if ex else 100.0
            rows.append((pct, os.path.relpath(p, TARGET), len(cv), len(ex)))
    rows.sort()
    for pct, rel, cv, ex in rows[: args.report]:
        print(f"  {pct:5.1f}%  {cv:4d}/{ex:<4d}  {rel}")
    total = 100.0 * tot_cov / max(tot_exec, 1)
    print(f"pycov: TOTAL {total:.1f}% ({tot_cov}/{tot_exec} lines), "
          f"underlying exit {code}")
    if code:
        return code
    if total < args.min:
        print(f"pycov: below --min {args.min}%")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
