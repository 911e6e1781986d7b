#!/usr/bin/env python
"""Collect-boundary lint (VERDICT r9 #7): every ``.collect()`` in
non-test source must be PROVABLY bounded.

``.collect()`` on a corpus-sized frame turns a distributed operator
into a driver loop — the failure class the round verdicts have been
hand-auditing each round. This lint makes the invariant mechanical:

Auto-sanctioned (structurally bounded — visible in the call chain):
  * ``...limit(N).collect()`` — explicit row cap;
  * ``...agg(...).collect()`` / ``groupBy(<bounded>).agg(...)`` is
    NOT auto-sanctioned (group cardinality is data-dependent) —
    only a chain whose LAST frame-producing step is ``agg`` with no
    ``groupBy`` in between (a 1-row global aggregate);
  * ``...head(N)`` / ``take(N)`` forms.

Everything else needs an explicit annotation ON the call line or
the line above::

    rows = frame.collect()  # collect-bound: <why this is bounded>

The annotation is a claim reviewed in code review, not a bypass:
the lint's job is to make NEW unbounded collects impossible to add
silently.  Exit 1 on any unannotated, non-structural site.

Run: ``python tools/collect_lint.py`` (also asserted by
tests/test_correctness.py so it rides every gate).
"""

from __future__ import annotations

import ast
import os
import sys

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "afg_data_pipeline_spark",
)

ANNOTATION = "collect-bound:"


def _chain_attrs(node: ast.AST) -> list[str]:
    """Attribute/method names along the receiver chain, outermost
    last: ``a.limit(5).collect()`` -> ['limit', 'collect']."""
    names: list[str] = []
    cur = node
    while True:
        if isinstance(cur, ast.Call):
            cur = cur.func
        elif isinstance(cur, ast.Attribute):
            names.append(cur.attr)
            cur = cur.value
        else:
            break
    return list(reversed(names))


def _structurally_bounded(call: ast.Call) -> bool:
    """True when the call chain itself proves a row bound."""
    chain = _chain_attrs(call)
    if not chain or chain[-1] != "collect":
        return False
    body = chain[:-1]
    # walk backward over frame transforms that preserve the bound
    passthrough = {
        "select", "withColumn", "withColumnRenamed", "alias",
        "cache", "persist", "localCheckpoint", "drop", "filter",
        "where", "coalesce",
    }
    i = len(body) - 1
    while i >= 0 and body[i] in passthrough:
        i -= 1
    if i < 0:
        return False
    last = body[i]
    if last in {"limit", "head", "take", "first"}:
        return True
    if last == "agg":
        # a global aggregate is 1 row unless a groupBy IMMEDIATELY
        # feeds it (groupBy().agg().agg() re-aggregates the grouped
        # result down to one global row)
        return i == 0 or body[i - 1] != "groupBy"
    return False


def lint() -> list[str]:
    errors: list[str] = []
    for dirpath, _dirs, files in os.walk(ROOT):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as fh:
                src = fh.read()
            lines = src.splitlines()
            tree = ast.parse(src, filename=path)
            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "collect"
                    and not node.args
                ):
                    continue
                if _structurally_bounded(node):
                    continue
                lo = max(0, node.lineno - 2)
                hi = min(len(lines), node.end_lineno + 1)
                window = "\n".join(lines[lo:hi])
                if ANNOTATION in window:
                    continue
                rel = os.path.relpath(path, os.path.dirname(ROOT))
                errors.append(
                    f"{rel}:{node.lineno}: unbounded .collect() — "
                    "cap it (limit/agg) or annotate the line with "
                    f"'# {ANNOTATION} <reason>'"
                )
    return errors


def main() -> int:
    errors = lint()
    for e in errors:
        print(e)
    n_ok = "clean" if not errors else f"{len(errors)} violations"
    print(f"collect_lint: {n_ok}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
