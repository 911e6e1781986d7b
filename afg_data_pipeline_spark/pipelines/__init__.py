"""Pipeline orchestration (reference entry points E1/E2/E3)."""
