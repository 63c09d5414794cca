"""The composed warehouse health report: every section present, the
planted FK orphans flagged, the clean control edge passing."""

from __future__ import annotations

from examples.warehouse_health_report import health_report
from tests.conftest import SF_DIR_MID


def test_health_report_sections_and_verdicts(spark):
    rows = health_report(spark, SF_DIR_MID).collect()
    by_check: dict[str, list] = {}
    for r in rows:
        by_check.setdefault(r.check, []).append(r)
    assert set(by_check) == {
        "fk_integrity",
        "expectations",
        "shuffle_skew",
        "profile_orders",
        "profile_documents",
    }
    fk = {(r.subject, r.metric): r for r in by_check["fk_integrity"]}
    # planted orphans fail their edges; the control edge passes
    for edge in (
        "orders.o_custkey->customer",
        "lineitem.l_partkey->part",
        "lineitem.l_suppkey->supplier",
    ):
        r = fk[(edge, "n_orphans")]
        assert r.value > 0 and not r.ok
    ctrl = fk[("customer.c_nationkey->nation", "n_orphans")]
    assert ctrl.value == 0 and ctrl.ok
    # skew + profiles are non-degenerate
    assert all(r.ok for r in by_check["shuffle_skew"])
    assert any(r.metric == "n_distinct" for r in by_check["profile_orders"])
