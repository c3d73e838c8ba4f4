"""Cron scheduling parity — UNIX cron strings firing AvailableNow runs.

Reference: a pipeline carries a "UNIX cron string"
(backend/pipeline_v2/models.py:88-89); the scheduler registers it
(backend/scheduler/helper.py:28-49) and each fire runs
`execute_pipeline_task_v2` (backend/scheduler/tasks.py:214-281), which
flips the pipeline INPROGRESS and executes the workflow with file
history on (the incremental-discovery semantics).

Spark-first: a fire IS one `Trigger.AvailableNow` drain (SURVEY §2.11)
— the stream checkpoint supplies the only-new-files semantics the
reference gets from file-history dedup. This module owns the cron math
and the fire loop; it deliberately contains no daemon: the host calls
`run_due(now)` from whatever clock it trusts (cron, Airflow, a sleep
loop), mirroring the reference's external beat scheduler.

Cron subset: the standard 5 fields (minute hour day-of-month month
day-of-week), with `*`, lists, ranges, and `*/step`; day-of-week 0 and
7 both mean Sunday. Standard quirk honored: when BOTH dom and dow are
restricted, the date matches if EITHER does (Vixie cron OR-rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable

_FIELD_RANGES = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 7))


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron step must be positive: {step}")
        if part == "*":
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        elif step != 1:
            # Vixie cron: a bare value with a step ("5/15" in the
            # minute field) means "from that value to the top of the
            # range" ("5-59/15"), not the single value.
            start, end = int(part), hi
        else:
            start = end = int(part)
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"cron field out of range [{lo},{hi}]: {spec!r}")
        vals.update(range(start, end + 1, step))
    return frozenset(vals)


@dataclass(frozen=True)
class Cron:
    """Parsed 5-field cron expression."""

    minute: frozenset[int]
    hour: frozenset[int]
    dom: frozenset[int]
    month: frozenset[int]
    dow: frozenset[int]
    dom_restricted: bool
    dow_restricted: bool

    @classmethod
    def parse(cls, expr: str) -> "Cron":
        fields = expr.split()
        if len(fields) != 5:
            raise ValueError(f"cron needs 5 fields, got {len(fields)}: {expr!r}")
        sets = [
            _parse_field(f, lo, hi) for f, (lo, hi) in zip(fields, _FIELD_RANGES)
        ]
        dow = frozenset(d % 7 for d in sets[4])  # 7 == 0 == Sunday
        return cls(
            minute=sets[0],
            hour=sets[1],
            dom=sets[2],
            month=sets[3],
            dow=dow,
            dom_restricted=fields[2] != "*",
            dow_restricted=fields[4] != "*",
        )

    def matches(self, t: datetime) -> bool:
        if t.minute not in self.minute or t.hour not in self.hour:
            return False
        if t.month not in self.month:
            return False
        dom_ok = t.day in self.dom
        dow_ok = (t.weekday() + 1) % 7 in self.dow  # Monday=0 -> cron Sunday=0
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok  # Vixie OR-rule
        return dom_ok and dow_ok

    def next_fire(self, after: datetime) -> datetime:
        """First matching minute strictly after `after` (minute
        resolution; bounded scan — a valid cron matches within 4 years
        even for Feb-29 schedules)."""
        t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
        limit = after + timedelta(days=4 * 366)
        while t <= limit:
            if self.matches(t):
                return t
            t += timedelta(minutes=1)
        raise ValueError("cron never fires (e.g. Feb 30)")


@dataclass
class PipelineSchedule:
    """A scheduled pipeline: id + cron + the fire action (typically a
    closure over incremental_dedup_pipeline / incremental_file_pipeline
    with pinned source/checkpoint dirs)."""

    pipeline_id: str
    cron: Cron
    fire: Callable[[], None]
    last_fire: datetime | None = None
    status: str = "IDLE"  # IDLE | INPROGRESS | SUCCESS | FAILURE
    last_error: str | None = None
    fires: int = 0
    failures: int = 0
    # memoized next fire time — next_fire() scans minute-by-minute (a
    # sparse cron like "0 0 29 2 *" costs ~2.1M matches), so it runs
    # once per fire, not once per poll
    next_due: datetime | None = None


@dataclass
class Scheduler:
    """Driver-side fire loop over registered schedules.

    `run_due(now)` fires every schedule whose cron matched at least
    once in (last_fire, now] — a host that polls coarser than a minute
    still fires (catch-up-one semantics: N missed slots collapse into
    one drain, which is correct because a drain processes ALL files
    accumulated since the previous drain). Failures are isolated per
    pipeline and recorded, like the reference's per-task try/except
    (scheduler/tasks.py:276-281).
    """

    schedules: dict[str, PipelineSchedule] = field(default_factory=dict)

    def add(
        self, pipeline_id: str, cron_string: str, fire: Callable[[], None]
    ) -> PipelineSchedule:
        if pipeline_id in self.schedules:
            raise ValueError(f"pipeline {pipeline_id!r} already scheduled")
        sched = PipelineSchedule(pipeline_id, Cron.parse(cron_string), fire)
        self.schedules[pipeline_id] = sched
        return sched

    def remove(self, pipeline_id: str) -> None:
        self.schedules.pop(pipeline_id, None)

    def due(self, now: datetime) -> list[PipelineSchedule]:
        out = []
        for s in self.schedules.values():
            if s.next_due is None:
                anchor = s.last_fire or (now - timedelta(minutes=1))
                s.next_due = s.cron.next_fire(anchor)
            if s.next_due <= now:
                out.append(s)
        return out

    def run_due(self, now: datetime) -> list[str]:
        """Fire all due pipelines; returns the ids that fired."""
        fired = []
        for s in self.due(now):
            s.status = "INPROGRESS"
            s.last_fire = now
            s.next_due = None  # recompute from the new anchor next poll
            s.fires += 1
            try:
                s.fire()
                s.status = "SUCCESS"
                s.last_error = None
            except Exception as e:  # noqa: BLE001 — per-pipeline isolation
                s.status = "FAILURE"
                s.failures += 1
                s.last_error = str(e)[:500]
            fired.append(s.pipeline_id)
        return fired


def poll_plan(
    posts,
    key_col: str,
    ts_col: str,
    min_interval_us: int = 3_600_000_000,
    max_interval_us: int = 86_400_000_000,
):
    """Adaptive polling cadence from an observed posting log — the
    feed-freshness half of the crawl/feed story (reference: pipelines
    poll sources on a FIXED cron, backend/pipeline_v2/models.py:88-89;
    a 100 TB feed fleet can't afford one-cadence-fits-all, so the
    cadence is LEARNED from each source's history and fed back into
    the scheduler as per-source schedules).

    `posts` holds one row per observed item (feed entry, file upload,
    queue message) with an exact epoch-microsecond timestamp. Per key:
    n_posts, first/last post, mean inter-post gap — computed as
    (last - first) div (n - 1), exact integer arithmetic, no window
    (the per-key gap mean needs only the extremes and the count, so
    the whole plan is ONE map-side-combining aggregate, no sort) —
    and next_poll_us = last + clamp(gap div 2, min, max): poll at
    Nyquist of the observed cadence, bounded. A single-post key has no
    gap and polls at max_interval (back off until it proves a
    cadence).

    Returns (key, n_posts, first_us, last_us, avg_gap_us,
    next_poll_us); `schedules_from_plan` turns rows into live
    Scheduler entries."""
    from pyspark.sql import functions as F

    g = posts.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_posts"),
        F.min(ts_col).alias("first_us"),
        F.max(ts_col).alias("last_us"),
    )
    gap = F.expr("(last_us - first_us) div (n_posts - 1)")
    half = F.expr(
        f"greatest({min_interval_us}L, least({max_interval_us}L, "
        "avg_gap_us div 2))"
    )
    return (
        g.withColumn(
            "avg_gap_us",
            F.when(F.col("n_posts") > 1, gap).otherwise(
                F.lit(None).cast("long")
            ),
        )
        .withColumn(
            "next_poll_us",
            F.col("last_us")
            + F.when(F.col("n_posts") > 1, half).otherwise(
                F.lit(max_interval_us).cast("long")
            ),
        )
    )


def schedules_from_plan(
    scheduler: "Scheduler",
    plan_rows,
    fire_factory: Callable[[str], Callable[[], None]],
) -> list[str]:
    """Register one pipeline per poll_plan row: the next_poll epoch
    becomes a one-shot-style cron pinned to that minute (minute hour
    dom month), so the host's run_due loop fires each source at its
    learned cadence; re-planning after a fire replaces the entry."""
    import datetime as _dt

    added = []
    for r in plan_rows:
        t = _dt.datetime.fromtimestamp(
            r["next_poll_us"] / 1_000_000, tz=_dt.timezone.utc
        )
        cron = f"{t.minute} {t.hour} {t.day} {t.month} *"
        pid = f"poll-{r['key']}"
        scheduler.remove(pid)
        scheduler.add(pid, cron, fire_factory(str(r["key"])))
        added.append(pid)
    return added
