"""Driver-materialization audit (VERDICT r2 #8, hardened r4): every
DRIVER-side ``.take_all()`` / ``.to_pandas()`` / ``.iter_rows()`` in the
package must carry a ``bound:`` annotation -- a comment, on the call
line or within the 4 lines above it, stating WHY the materialized size
is bounded (dimension grain, top-k limit, combiner-reduced aggregate,
explicit size gate, ...). Per-batch conversions inside map fns
(``batch.to_pandas()``) are exempt -- they are not driver
materializations.

PHANTOM-BOUND check (VERDICT r3 #3): twice in a row a ``bound:``
comment promised a gate the code never tested (r2 tf-idf vocab, r3 both
term-graph ops). So now any bound comment that claims ``gated at <name>``
/ ``gated by <name>`` must name a parameter that some condition
expression (``if``/``while``/ternary/assert/comprehension-if) in the
ENCLOSING FUNCTION actually tests; otherwise the annotation is a
phantom and the audit fails. Static grains that merely mention a knob
without a branch should say ``bound-static:`` instead.

Run standalone (exit 1 on violations) or via tests/test_audit.py. The
point is not the comment itself: it forces every new materialization to
state its bound at review time, so an UNBOUNDED one cannot land
silently -- and a CLAIMED gate must exist in code.
"""

from __future__ import annotations

import ast
import os
import re
import sys

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "deekseek_ocr___dockerized_api_ray")

CALL = re.compile(r"\.(take_all|iter_rows)\(\)|\.to_pandas\(\)")
# per-batch conversions, not driver materializations:
EXEMPT = re.compile(r"\bbatch\.to_pandas\(\)|isinstance\(batch")
GATE_CLAIM = re.compile(r"gated\s+(?:at|by)\s+([A-Za-z_][\w]*)")
LOOKBACK = 4


def _condition_names(fn: ast.AST) -> set:
    """Identifiers referenced by any condition expression in ``fn``."""
    names: set = set()

    def collect(expr):
        for n in ast.walk(expr):
            if isinstance(n, ast.Name):
                names.add(n.id)
            elif isinstance(n, ast.Attribute):
                names.add(n.attr)

    for node in ast.walk(fn):
        if isinstance(node, (ast.If, ast.While, ast.IfExp, ast.Assert)):
            collect(node.test)
        elif isinstance(node, ast.comprehension):
            for t in node.ifs:
                collect(t)
    return names


def _enclosing_function(tree: ast.AST, lineno: int):
    """Innermost function whose span contains ``lineno`` (or None)."""
    best = None
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if node.lineno <= lineno <= (node.end_lineno or node.lineno):
                if best is None or node.lineno > best.lineno:
                    best = node
    return best


def audit(pkg_root: str = PKG) -> list:
    violations = []
    for root, _dirs, files in os.walk(pkg_root):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            src = open(path).read()
            lines = src.splitlines()
            tree = None
            for i, line in enumerate(lines):
                if not CALL.search(line) or EXEMPT.search(line):
                    continue
                window = lines[max(0, i - LOOKBACK): i + 1]
                bound = [w for w in window
                         if "bound:" in w or "bound-static:" in w]
                rel = os.path.relpath(path, os.path.dirname(pkg_root))
                if not bound:
                    violations.append(
                        f"{rel}:{i + 1}: unannotated: {line.strip()}")
                    continue
                # phantom-gate check: a claimed gate parameter must be
                # tested by a condition in the enclosing function
                claimed = [m.group(1) for w in bound
                           if "bound-static:" not in w
                           for m in GATE_CLAIM.finditer(w)]
                if not claimed:
                    continue
                if tree is None:
                    tree = ast.parse(src)
                fn = _enclosing_function(tree, i + 1)
                tested = _condition_names(fn) if fn is not None else set()
                for name in claimed:
                    if name not in tested:
                        violations.append(
                            f"{rel}:{i + 1}: phantom bound: claims "
                            f"'gated at {name}' but no enclosing "
                            f"condition tests it: {line.strip()}")
    return violations


if __name__ == "__main__":
    v = audit()
    for x in v:
        print(x)
    print(f"{len(v)} driver-materialization violations")
    sys.exit(1 if v else 0)
