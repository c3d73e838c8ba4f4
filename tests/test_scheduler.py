"""Cron scheduler (§3.2 parity): cron math, Vixie dom/dow OR-rule,
catch-up-one firing, per-pipeline failure isolation, and a scheduled
AvailableNow drain over a real file stream.
"""

from datetime import datetime

import pytest

from unstract_spark.streaming.scheduler import Cron, Scheduler


def test_cron_parse_and_match():
    c = Cron.parse("*/15 9-17 * * 1-5")
    assert c.matches(datetime(2026, 8, 12, 9, 0))  # Wed 09:00
    assert c.matches(datetime(2026, 8, 12, 16, 45))
    assert not c.matches(datetime(2026, 8, 12, 9, 7))  # off-step minute
    assert not c.matches(datetime(2026, 8, 12, 18, 0))  # after hours
    assert not c.matches(datetime(2026, 8, 15, 9, 0))  # Saturday


def test_cron_sunday_aliases():
    for expr in ("0 0 * * 0", "0 0 * * 7"):
        assert Cron.parse(expr).matches(datetime(2026, 8, 16, 0, 0))  # Sunday


def test_cron_vixie_or_rule():
    # dom AND dow both restricted -> fire if EITHER matches
    c = Cron.parse("0 0 13 * 5")  # 13th OR Friday
    assert c.matches(datetime(2026, 8, 13, 0, 0))  # Thu the 13th (dom)
    assert c.matches(datetime(2026, 8, 14, 0, 0))  # Friday (dow)
    assert not c.matches(datetime(2026, 8, 15, 0, 0))  # Sat the 15th
    # only dow restricted -> plain AND semantics
    c2 = Cron.parse("0 0 * * 5")
    assert not c2.matches(datetime(2026, 8, 13, 0, 0))


def test_cron_next_fire():
    c = Cron.parse("30 2 * * *")
    assert c.next_fire(datetime(2026, 8, 13, 2, 30)) == datetime(2026, 8, 14, 2, 30)
    assert c.next_fire(datetime(2026, 8, 13, 1, 0)) == datetime(2026, 8, 13, 2, 30)


def test_cron_rejects_bad_exprs():
    for bad in ("* * * *", "61 * * * *", "*/0 * * * *", "0 0 31 2 *"):
        with pytest.raises(ValueError):
            cron = Cron.parse(bad)
            cron.next_fire(datetime(2026, 1, 1))


def test_scheduler_catch_up_one_and_isolation():
    fired: list[str] = []

    def ok():
        fired.append("ok")

    def boom():
        raise RuntimeError("connector down")

    s = Scheduler()
    s.add("p-ok", "*/5 * * * *", ok)
    s.add("p-bad", "*/5 * * * *", boom)
    with pytest.raises(ValueError, match="already scheduled"):
        s.add("p-ok", "* * * * *", ok)

    # an hour of missed slots collapses into ONE fire each
    now = datetime(2026, 8, 13, 12, 0)
    assert sorted(s.run_due(now)) == ["p-bad", "p-ok"]
    assert fired == ["ok"]
    assert s.schedules["p-ok"].status == "SUCCESS"
    bad = s.schedules["p-bad"]
    assert bad.status == "FAILURE" and "connector down" in bad.last_error
    assert bad.failures == 1

    # nothing due 2 minutes later; due again at the next slot
    assert s.run_due(datetime(2026, 8, 13, 12, 2)) == []
    assert sorted(s.run_due(datetime(2026, 8, 13, 12, 5))) == ["p-bad", "p-ok"]
    assert fired == ["ok", "ok"]


def test_scheduled_incremental_drain(spark, tmp_path):
    """Two cron fires over a growing source dir: each fire is one
    AvailableNow drain that sees only new files (checkpoint ledger)."""
    from unstract_spark.streaming.incremental import incremental_dedup_pipeline

    src = tmp_path / "in"
    src.mkdir()
    seen: list[list[str]] = []

    def fire():
        batch_rows: list[str] = []

        def sink(df, _epoch):
            batch_rows.extend(r.path.rsplit("/", 1)[-1] for r in df.collect())

        incremental_dedup_pipeline(
            spark, str(src), str(tmp_path / "ckpt"), sink
        )
        seen.append(sorted(batch_rows))

    s = Scheduler()
    s.add("etl-1", "*/10 * * * *", fire)

    (src / "a.txt").write_text("alpha")
    s.run_due(datetime(2026, 8, 13, 10, 0))
    (src / "b.txt").write_text("beta")
    (src / "a_copy.txt").write_text("alpha")  # duplicate content
    s.run_due(datetime(2026, 8, 13, 10, 10))

    assert seen[0] == ["a.txt"]
    assert seen[1] == ["b.txt"]  # a_copy dropped by content dedup, a.txt by ledger
    assert s.schedules["etl-1"].fires == 2
    assert s.schedules["etl-1"].status == "SUCCESS"


# -- property tests ------------------------------------------------------

from datetime import timedelta

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    minute=st.integers(0, 59),
    hour=st.integers(0, 23),
    anchor=st.datetimes(
        min_value=datetime(2026, 1, 1), max_value=datetime(2027, 1, 1)
    ),
)
@settings(max_examples=150, deadline=None)
def test_next_fire_matches_and_advances(minute, hour, anchor):
    c = Cron.parse(f"{minute} {hour} * * *")
    nxt = c.next_fire(anchor)
    assert nxt > anchor
    assert c.matches(nxt)
    assert nxt.minute == minute and nxt.hour == hour
    # firing daily: the next fire after this one is exactly 24h later
    assert c.next_fire(nxt) == nxt + timedelta(days=1)


@given(
    step=st.integers(1, 30),
    anchor=st.datetimes(
        min_value=datetime(2026, 1, 1), max_value=datetime(2026, 12, 31)
    ),
)
@settings(max_examples=100, deadline=None)
def test_step_field_fires_on_multiples(step, anchor):
    c = Cron.parse(f"*/{step} * * * *")
    nxt = c.next_fire(anchor)
    assert nxt.minute % step == 0
    assert (nxt - anchor).total_seconds() <= step * 60


def test_cron_value_with_step_expands_to_range():
    # Vixie cron: "5/15" in the minute field means 5-59/15
    c = Cron.parse("5/15 * * * *")
    assert c.minute == frozenset({5, 20, 35, 50})
    assert c.matches(datetime(2026, 8, 12, 9, 35))
    assert not c.matches(datetime(2026, 8, 12, 9, 15))


def test_due_memoizes_sparse_cron_next_fire():
    # A Feb-29 schedule must not re-scan ~2.1M minutes on every poll:
    # after the first due() computes next_due, later polls reuse it.
    s = Scheduler()
    sched = s.add("leap", "0 0 29 2 *", lambda: None)
    now = datetime(2026, 3, 1, 0, 0)
    assert s.due(now) == []
    first = sched.next_due
    assert first == datetime(2028, 2, 29, 0, 0)
    sched.cron = None  # poison: any recompute would now blow up
    assert s.due(datetime(2026, 3, 1, 0, 5)) == []  # memo hit, no scan


def test_run_due_resets_memo_for_next_anchor():
    s = Scheduler()
    sched = s.add("everymin", "* * * * *", lambda: None)
    assert s.run_due(datetime(2026, 8, 12, 9, 0)) == ["everymin"]
    assert sched.next_due is None  # recomputed from new last_fire next poll
    assert s.run_due(datetime(2026, 8, 12, 9, 1)) == ["everymin"]
    assert sched.fires == 2


def test_poll_plan_cadence_and_scheduler_wiring(spark):
    from unstract_spark.streaming.scheduler import (
        Scheduler,
        poll_plan,
        schedules_from_plan,
    )

    H = 3_600_000_000
    posts = spark.createDataFrame(
        [
            # feed "a": posts every 4h -> next = last + 2h (Nyquist)
            ("a", 0), ("a", 4 * H), ("a", 8 * H),
            # feed "b": posts every 30min -> gap/2 clamps UP to 1h
            ("b", 0), ("b", H // 2), ("b", H),
            # feed "c": posts every 96h -> gap/2 clamps DOWN to 24h
            ("c", 0), ("c", 96 * H),
            # feed "d": single post -> no cadence, back off to 24h
            ("d", 5 * H),
        ],
        "feed string, us long",
    )
    plan = {
        r.key: r for r in poll_plan(posts, "feed", "us").collect()
    }
    assert plan["a"].avg_gap_us == 4 * H
    assert plan["a"].next_poll_us == 8 * H + 2 * H
    assert plan["b"].next_poll_us == H + H          # clamped to min 1h
    assert plan["c"].next_poll_us == 96 * H + 24 * H  # clamped to max 24h
    assert plan["d"].avg_gap_us is None
    assert plan["d"].next_poll_us == 5 * H + 24 * H

    # rows become live scheduler entries that fire at their minute
    s = Scheduler()
    fired: list[str] = []
    ids = schedules_from_plan(
        s, plan.values(), lambda key: (lambda: fired.append(key))
    )
    assert sorted(ids) == ["poll-a", "poll-b", "poll-c", "poll-d"]
    # feed a's next poll = epoch 10h = 1970-01-01 10:00 UTC
    from datetime import datetime, timezone

    s.run_due(datetime(1970, 1, 1, 10, 0, tzinfo=timezone.utc))
    assert fired == ["a"]
    # re-planning replaces, not duplicates
    ids2 = schedules_from_plan(
        s, [plan["a"]], lambda key: (lambda: fired.append(key))
    )
    assert ids2 == ["poll-a"] and len(s.schedules) == 4
