"""DuckDB-oracle correctness gate over every declared query.

Mirrors the driver's t2 check (SURVEY.md §5.1) at sf0.001 so the
whole registry is validated on every pytest run. Exact compare —
floats must match bit-for-bit, which the decimal-accumulation
convention (functions/numeric.py) guarantees.

DRIVER PARITY: the gate runs with spark.sql.ansi.enabled=TRUE —
the driver supplies its own Spark 4 session where that is the
default, and round 3's only red row (near_dup_components_star) was
an ANSI-only long overflow that the engine's ANSI-off session
masked in every local check. Registered queries must be correct
under ANY session conf (CLAUDE.md rule 11).
"""

from __future__ import annotations

import pytest

from afg_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_DIR, assert_frames_match


@pytest.fixture(scope="module", autouse=True)
def _ansi_on(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    # Driver-canonicalizability gate (round-6/7 red-row class):
    # the driver sorts/hashes results via pandas, which ERRs on
    # unhashable array/map/struct cells and renders DECIMAL
    # unequally across its two conversion paths. EVERY registered
    # output — rows-only included, since the driver pandas-sorts
    # those too (r7's unigram_tokenize ERR) — must stay in the
    # driver-safe scalar set (tools/schema_lint.py is the
    # standalone sweep).
    from tools.schema_lint import unsafe_fields

    bad = unsafe_fields(df.schema)
    assert not bad, (
        f"{name}: driver-uncanonicalizable output columns {bad} "
        "(project arrays to strings / string-cast decimals on "
        "both engine sides)"
    )
    if q.oracle is None:
        # Rows-only check, mirroring the driver's weaker fallback.
        assert df.count() >= 0
        return
    assert_frames_match(df, duck.execute(q.oracle))


def test_registry_integrity():
    for name, q in REGISTRY.items():
        assert q.doc, f"{name} has no docstring"
        assert q.fn.__name__, name


def test_collect_boundary_lint():
    """Every non-test .collect() is structurally bounded or carries
    a reviewed '# collect-bound:' annotation (tools/collect_lint) —
    the r9-verdict #7 invariant, mechanical instead of hand-audited."""
    from tools.collect_lint import lint

    assert lint() == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
