"""Dependency-free function-coverage collector for the test suite.

`coverage.py` is not installed on this machine (and installs are
forbidden), so this uses CPython 3.12's `sys.monitoring` PY_START events —
near-zero overhead because each code object disables its own event after
the first hit — to record which functions under `nle_tpu/` the suite
actually enters, then statically enumerates every def/lambda/comprehension
code object in the package and prints the ones never executed.

Usage (as a pytest plugin):
    python -m pytest tests/ -q -p tools.funccov
Writes a report to FUNCCOV.txt at the repo root and prints a summary.

Caveats: code running in SUBPROCESSES (the serving HTTP tests, the
multihost Gloo tests, CLI fuzz runs that spawn `python -m`) is not traced
in the parent — functions only exercised there show as uncovered; the
report marks known subprocess-only modules. This is a gap-FINDER, not a
gate.
"""

from __future__ import annotations

import os
import sys

TOOL_ID = 4  # sys.monitoring tool slots 0-5; pytest/pdb don't claim 4.
_PKG_ROOT = os.path.normpath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "nle_tpu"))
_hit: set[tuple[str, str, int]] = set()

# Modules whose functions mostly run in spawned subprocesses: uncovered
# entries there are expected (the suite exercises them over sockets/pipes).
_SUBPROCESS_ONLY = ("serving/http.py", "serving/pool.py",
                    "parallel/distributed.py", "cli/")


def _on_py_start(code, instruction_offset):
    fn = code.co_filename
    if fn.startswith(_PKG_ROOT):
        _hit.add((fn, code.co_qualname, code.co_firstlineno))
    return sys.monitoring.DISABLE


def pytest_configure(config):
    mon = sys.monitoring
    mon.use_tool_id(TOOL_ID, "funccov")
    mon.register_callback(TOOL_ID, mon.events.PY_START, _on_py_start)
    mon.set_events(TOOL_ID, mon.events.PY_START)


def _all_code_objects(root: str):
    """Yield (path, qualname, firstlineno) for every code object defined in
    every .py file under root, by compiling the source (no imports)."""
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            with open(path, "r", encoding="utf-8") as f:
                src = f.read()
            try:
                top = compile(src, path, "exec")
            except SyntaxError:
                continue
            stack = [top]
            while stack:
                co = stack.pop()
                for const in co.co_consts:
                    if hasattr(const, "co_code"):
                        stack.append(const)
                if co is not top:
                    yield (path, co.co_qualname, co.co_firstlineno)


def pytest_sessionfinish(session, exitstatus):
    mon = sys.monitoring
    mon.set_events(TOOL_ID, 0)
    mon.free_tool_id(TOOL_ID)

    defined = sorted(_all_code_objects(_PKG_ROOT))
    hit_keys = {(p, q) for (p, q, _ln) in _hit}
    missed = [(p, q, ln) for (p, q, ln) in defined if (p, q) not in hit_keys]
    total = len(defined)
    covered = total - len(missed)

    lines = [
        f"funccov: {covered}/{total} functions entered "
        f"({100.0 * covered / max(total, 1):.1f}%) — "
        "subprocess-exercised code is NOT traced (see tools/funccov.py)",
        "",
    ]
    for p, q, ln in missed:
        rel = os.path.relpath(p, os.path.dirname(_PKG_ROOT))
        tag = ""
        if any(s in rel.replace(os.sep, "/") for s in _SUBPROCESS_ONLY):
            tag = "  [subprocess-only module]"
        lines.append(f"MISS {rel}:{ln}  {q}{tag}")
    report = "\n".join(lines) + "\n"
    out = os.path.join(os.path.dirname(_PKG_ROOT), "FUNCCOV.txt")
    with open(out, "w", encoding="utf-8") as f:
        f.write(report)
    print(f"\n{lines[0]}\nreport: {out}")
