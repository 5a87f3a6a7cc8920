"""Fast oracle-SQL syntax gate: EXPLAIN (plan, don't execute) every
registered oracle against the real table views. A typo'd oracle
otherwise surfaces only in the multi-minute sweep — or worse, in the
driver's correctness run. Runs in seconds, no Spark session needed."""

from __future__ import annotations

from alexandria_pipeline_spark import ORACLES, register_all
from tests.conftest import SF_SMOKE
from tests.oracle import duck_connection


def test_every_oracle_plans_in_duckdb():
    register_all()
    con = duck_connection(SF_SMOKE)
    broken: list[str] = []
    for name, sql in sorted(ORACLES.items()):
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 - collect all breakages
            broken.append(f"{name}: {type(exc).__name__}: {str(exc)[:120]}")
    assert not broken, "\n".join(broken)


def test_every_oracle_has_a_query():
    register_all()
    from alexandria_pipeline_spark import QUERIES

    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, orphans
