"""Registry-wide physical/logical plan anti-pattern audit.

Builds every registered query's DataFrame at sf0.001 (no execution
beyond what plan CONSTRUCTION itself requires — bounded model
collects et al.) and counts plan-level anti-patterns:

- ``cartesian``: CartesianProduct / Join Cross nodes. Unhinted
  cross joins that aren't 1-row broadcast stat joins are the
  classic 100 TB killer.
- ``partitionless_window``: Window nodes whose partition spec is
  empty — a global window funnels the input through ONE task.
  Legit only over value-space-bounded tables (rank over a
  vocabulary), never over a corpus.
- ``python_udf_row``: BatchEvalPython (row-at-a-time Python UDF) —
  the slow path; the engine's convention is ZERO of these.
- ``pandas_udf``: ArrowEvalPython / FlatMapGroupsInPandas /
  MapInPandas — sanctioned but counted, so a new one shows up in
  review.

The counts are compared against the committed baseline
(tools/plan_audit_baseline.json). Exit 1 on any REGRESSION (a
query whose count for any category exceeds the baseline, or a new
query with nonzero counts that has no baseline entry). Improvements
print a note suggesting a baseline refresh. This makes "no new
cartesians / global windows / row-UDFs" a machine-checked property
instead of a per-round hand audit.

Usage:
  python tools/plan_audit.py               # audit vs baseline
  python tools/plan_audit.py --write       # refresh the baseline
  python tools/plan_audit.py q1 q2 ...     # audit a subset
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, _REPO_ROOT)

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "plan_audit_baseline.json",
)
SF_DIR = os.environ.get(
    "SPARK_GRAFT_SF_DIR_AUDIT", "/root/testdata/sf0.001"
)

CATEGORIES = (
    "cartesian",
    "partitionless_window",
    "python_udf_row",
    "pandas_udf",
    "bnlj",
)

def _partitionless_windows(plan: str) -> int:
    """Count windowspecdefinition(...) occurrences with an empty
    partition spec. The spec prints its args as
    ``windowspecdefinition(pcols..., ocols ASC/DESC..., specified
    windowframe(...))`` and EMPTY lists are simply omitted, so a
    partitionless window is one whose args (minus the frame) are
    all ORDER specs (contain ASC/DESC) or absent. Args are split
    at paren depth 1 to survive nested expressions."""
    n = 0
    start = 0
    needle = "windowspecdefinition("
    while True:
        i = plan.find(needle, start)
        if i < 0:
            return n
        j = i + len(needle)
        depth = 1
        args, cur = [], []
        while j < len(plan) and depth > 0:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            if depth == 1 and ch == ",":
                args.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
            j += 1
        args.append("".join(cur))
        # drop the frame arg(s) — anything from the first
        # specifiedwindowframe onward
        spec = [
            a
            for a in args
            if "specifiedwindowframe" not in a and a.strip()
        ]
        if all(
            (" ASC" in a or " DESC" in a) for a in spec
        ):
            n += 1
        start = j + 1


def _counts(plan_logical: str, plan_physical: str) -> dict:
    return {
        "cartesian": (
            plan_physical.count("CartesianProduct")
            + plan_logical.count("Join Cross")
        ),
        # BNLJ is excluded from whole-stage codegen (rule 23):
        # fine for 1-row stat broadcasts, an interpreted-evaluation
        # trap for real pair streams — counted so new ones surface.
        "bnlj": plan_physical.count("BroadcastNestedLoopJoin"),
        "partitionless_window": _partitionless_windows(
            plan_logical
        ),
        "python_udf_row": plan_physical.count("BatchEvalPython"),
        "pandas_udf": (
            plan_physical.count("ArrowEvalPython")
            + plan_physical.count("FlatMapGroupsInPandas")
            + plan_physical.count("MapInPandas")
        ),
    }


def main() -> int:
    write = "--write" in sys.argv
    names = [
        a for a in sys.argv[1:] if not a.startswith("--")
    ]

    from afg_data_pipeline_spark.plans import REGISTRY
    from afg_data_pipeline_spark.session import get_session

    spark = get_session("plan_audit")
    todo = names or sorted(REGISTRY)
    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in todo:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            qe = df._jdf.queryExecution()
            logical = qe.optimizedPlan().toString()
            physical = qe.executedPlan().toString()
            results[name] = _counts(logical, physical)
        except Exception as exc:  # audit must visit every query
            errors[name] = f"{type(exc).__name__}: {exc}"
    if errors:
        for n, e in sorted(errors.items()):
            print(f"ERR   {n}: {e[:200]}")
        print(f"{len(errors)} queries failed to build — fix first")
        return 1

    if write:
        merged = results
        if names and os.path.exists(BASELINE_PATH):
            # subset --write merges into the existing baseline:
            # a full overwrite would silently drop every other
            # query's entry.
            with open(BASELINE_PATH) as fh:
                merged = json.load(fh)
            merged.update(results)
        with open(BASELINE_PATH, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
        tot = {
            c: sum(r[c] for r in merged.values())
            for c in CATEGORIES
        }
        print(f"baseline written: {len(merged)} queries, {tot}")
        return 0

    try:
        with open(BASELINE_PATH) as fh:
            baseline = json.load(fh)
    except OSError:
        print("no baseline — run with --write first")
        return 1

    regressions, improvements = [], []
    for name, got in sorted(results.items()):
        base = baseline.get(name)
        if base is None:
            if any(got[c] for c in CATEGORIES):
                regressions.append(
                    (name, "NEW query with nonzero counts", got)
                )
            continue
        for c in CATEGORIES:
            if got[c] > base.get(c, 0):
                regressions.append(
                    (name, f"{c} {base.get(c, 0)} -> {got[c]}", got)
                )
            elif got[c] < base.get(c, 0):
                improvements.append((name, c, base[c], got[c]))
    for name, why, got in regressions:
        print(f"REGRESSION {name}: {why}  {got}")
    for name, c, b, g in improvements:
        print(f"improved   {name}: {c} {b} -> {g} (refresh baseline)")
    n = len(results)
    tot = {
        c: sum(r[c] for r in results.values()) for c in CATEGORIES
    }
    print(
        f"{n} queries audited, totals {tot}, "
        f"{len(regressions)} regressions"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
