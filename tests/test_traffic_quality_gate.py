"""The composed traffic-quality gate example: the three sections are
present, verdicts are per-user, and the conversion section only
counts kept users."""

from __future__ import annotations

from examples.traffic_quality_gate import traffic_quality_gate
from tests.conftest import SF_DIR


def test_traffic_quality_gate_end_to_end(spark):
    rows = traffic_quality_gate(spark, SF_DIR).collect()
    by_check: dict[str, list] = {}
    for r in rows:
        by_check.setdefault(r.check, []).append(r)
    assert set(by_check) == {"bot_gate", "conversion", "content_families"}
    # one verdict per user, each keep or drop
    verdicts = by_check["bot_gate"]
    assert len(verdicts) == len({r.subject for r in verdicts})
    assert {r.metric for r in verdicts} <= {"keep", "drop_timer_regular"}
    # the conversion rate is computed over kept users only and the
    # fixture has conversions among them
    (conv,) = by_check["conversion"]
    assert conv.value > 0
    # the family census covers every component size >= 2
    assert all(r.subject.startswith("size:") for r in
               by_check["content_families"])
