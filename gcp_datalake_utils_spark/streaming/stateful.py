"""Custom stateful streaming operator: a gap-based sessionizer built on
``applyInPandasWithState`` (north-star §2.9 extension — the escape hatch
for session semantics the built-in ``session_window`` can't express,
here per-session distinct-type counts and duration).

Execution model: events stream in grouped by ``user_id``; each user's
open session lives in a GroupState tuple (start/last ns, counts, value
sum, distinct-type set). A new event either extends the open session or
closes it — closed sessions are APPENDED downstream immediately, the
open one stays in state. State is one tuple per active user, bounded by
the user population with open sessions, not by stream length; the Arrow
batch transfer keeps the Python stage vectorized.

Determinism caveat (documented, test-guarded): sessions are emitted only
when CLOSED by a later event, so each user's final (still-open) session
stays in state at drain time — the oracle therefore excludes every
user's last session. Within a micro-batch events are sorted by event
time; cross-batch reordering is bounded in production by pairing this
with ``withWatermark`` upstream (the AvailableNow drain here delivers
the single parquet file as one ordered batch).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gcp_datalake_utils_spark.streaming.windows import (
    _event_stream,
    _next_sink,
    run_available_now,
)

SESSION_GAP_SECS = 900  # same 15-minute gap as windows.user_sessions

# Round 14 (guide §4): applyInPandasWithState pays a per-GROUP Arrow
# round-trip + state encode/decode; grouping by raw user_id made that
# thousands of tiny groups per micro-batch (driver scaling ratios
# 1.0-1.5 at 4x cores — framework-bound, not compute-bound). Events
# are instead grouped by a FIXED user bucket (pmod(user_id, 64)) and
# each bucket's GroupState holds the per-user automaton states as one
# JSON map — ~64 Arrow groups instead of ~|users|, identical per-user
# event-time logic, identical output set (bucket count is a constant,
# never core-derived, so results cannot depend on SPARK_GRAFT_CPUS).
# JSON round-trips every state field exactly: ints are exact, floats
# serialize via repr (shortest round-trip), strings are escaped.
N_USER_BUCKETS = 64

OUTPUT_SCHEMA = ("user_id long, session_start string, n_events long, "
                 "n_event_types long, duration_secs long, "
                 "session_value double")
STATE_SCHEMA = "users string"


def _closed_frame(uids: list, rows: list[tuple]) -> pd.DataFrame:
    """Closed-session tuples -> output frame, with the timestamp
    format vectorized over the whole bucket (one .dt.strftime pass
    instead of a pd.Timestamp per session — 96k sessions at sf0.1
    paid a Python strftime each; same strings: both paths format the
    naive UTC ns instant)."""
    start = pd.Series([r[0] for r in rows], dtype="int64")
    return pd.DataFrame({
        "user_id": pd.Series(uids, dtype="int64"),
        "session_start": pd.to_datetime(start)
        .dt.strftime("%Y-%m-%d %H:%M:%S"),
        "n_events": pd.Series([r[2] for r in rows], dtype="int64"),
        "n_event_types": pd.Series(
            [len(r[4].split("|")) for r in rows], dtype="int64"),
        "duration_secs": pd.Series(
            [(r[1] - r[0]) // 1_000_000_000 for r in rows],
            dtype="int64"),
        "session_value": pd.Series([r[3] for r in rows]).round(6),
    })


def _sessionize_user(st: tuple | None, sub: pd.DataFrame,
                     out: list[tuple]) -> tuple:
    """The per-user gap automaton over one user's event-time-ordered
    frame — byte-identical logic to the pre-bucketing r13 kernel
    (same ints, same float addition order, same type-string build).
    Closed sessions are appended to ``out`` as raw state tuples; the
    caller formats them in bulk (_closed_frame)."""
    sub = sub.sort_values("ts")
    ns_l = (sub["ts"].to_numpy().astype("datetime64[ns]")
            .astype("int64").tolist())
    for ns, etype, value in zip(ns_l, sub["event_type"].tolist(),
                                sub["value"].tolist()):
        if st is not None and \
                ns - st[1] > SESSION_GAP_SECS * 1_000_000_000:
            out.append(st)  # closed-session tuple; formatted in bulk
            st = None
        if st is None:
            st = (ns, ns, 1, float(value), str(etype))
        else:
            types = st[4] if str(etype) in st[4].split("|") \
                else st[4] + "|" + str(etype)
            st = (st[0], ns, st[2] + 1, st[3] + float(value), types)
    return st


def _sessionize(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Bucket kernel: key is the user bucket; per-user session tuples
    live in one JSON map per bucket (see N_USER_BUCKETS note)."""
    import json
    parts = list(pdfs)
    batch = parts[0] if len(parts) == 1 else pd.concat(parts)
    if len(batch) == 0:
        return
    st_map: dict = json.loads(state.get[0]) if state.exists else {}
    uids: list = []
    rows: list[tuple] = []
    for uid, sub in batch.groupby("user_id", sort=True):
        prev = st_map.get(str(uid))
        out: list[tuple] = []
        st = _sessionize_user(
            tuple(prev) if prev is not None else None, sub, out)
        st_map[str(uid)] = list(st)
        uids.extend([uid] * len(out))
        rows.extend(out)
    state.update((json.dumps(st_map),))
    if rows:
        yield _closed_frame(uids, rows)


def closed_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _event_stream(spark, sf_dir).select(
        "user_id", "ts", "event_type", "value",
        F.pmod("user_id", F.lit(N_USER_BUCKETS)).alias("ubucket"))
    return (e.groupBy("ubucket")
            .applyInPandasWithState(
                _sessionize, OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


def closed_sessions_stream_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """[Q] drained closed sessions (every session except each user's
    final open one), with stats session_window can't produce."""
    out = run_available_now(
        closed_sessions_stream(spark, sf_dir), _next_sink())
    return out.select("user_id", "session_start", "n_events",
                      "n_event_types", "duration_secs",
                      F.round("session_value", 6).alias("session_value"))


CLOSED_SESSIONS_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_SECS} SECOND
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
agg AS (
  SELECT user_id, session_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         count(*) AS n_events,
         count(DISTINCT event_type) AS n_event_types,
         CAST(floor(epoch(max(ts) - min(ts))) AS BIGINT)
           AS duration_secs,
         round(sum(value), 6) AS session_value,
         max(session_id) OVER (PARTITION BY user_id) AS last_session
  FROM sessions
  GROUP BY user_id, session_id
)
SELECT user_id, session_start, n_events, n_event_types, duration_secs,
       session_value
FROM agg WHERE session_id < last_session
"""


# --- streaming funnel: stateful sequential pattern matching -------------

FUNNEL_HORIZON_HOURS = 72
_FUNNEL_STEPS = ["view", "click", "purchase"]

FUNNEL_OUTPUT_SCHEMA = ("user_id long, t_view string, t_click string, "
                        "t_purchase string, total_secs long")
FUNNEL_STATE_SCHEMA = "users string"


def _advance_funnel_user(uid, st: tuple, sub: pd.DataFrame,
                         out: list[dict[str, Any]]) -> tuple:
    """Per-user funnel automaton: state is (step, t1, t2, t3) ns — one
    4-tuple per user regardless of stream length. Processing events in
    event-time order makes 'first qualifying event' equal the batch
    min() chain, so the batch funnel SQL is the oracle. A completed
    user parks at step=3 and ignores further events (first completion
    only, matching the batch chain). Logic byte-identical to the
    pre-bucketing r13 kernel."""
    sub = sub.sort_values("ts")
    step, t1, t2, t3 = st
    horizon_ns = FUNNEL_HORIZON_HOURS * 3600 * 1_000_000_000
    ns_l = (sub["ts"].to_numpy().astype("datetime64[ns]")
            .astype("int64").tolist())
    for ns, etype in zip(ns_l, sub["event_type"].tolist()):
        if step >= len(_FUNNEL_STEPS):
            break
        t_prev = (0, t1, t2)[step]
        if str(etype) != _FUNNEL_STEPS[step]:
            continue
        if step > 0 and not (ns > t_prev and ns - t_prev <= horizon_ns):
            continue
        if step == 0:
            t1 = ns
        elif step == 1:
            t2 = ns
        else:
            t3 = ns
            out.append({
                "user_id": uid,
                "t_view": pd.Timestamp(t1).strftime(
                    "%Y-%m-%d %H:%M:%S"),
                "t_click": pd.Timestamp(t2).strftime(
                    "%Y-%m-%d %H:%M:%S"),
                "t_purchase": pd.Timestamp(t3).strftime(
                    "%Y-%m-%d %H:%M:%S"),
                "total_secs": (t3 - t1) // 1_000_000_000,
            })
        step += 1
    return (step, t1, t2, t3)


def _advance_funnel(key: tuple, pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    """Bucket kernel: per-user (step, t1, t2, t3) tuples in one JSON
    map per user bucket (see N_USER_BUCKETS note)."""
    import json
    parts = list(pdfs)
    batch = parts[0] if len(parts) == 1 else pd.concat(parts)
    if len(batch) == 0:
        return
    st_map: dict = json.loads(state.get[0]) if state.exists else {}
    out: list[dict[str, Any]] = []
    for uid, sub in batch.groupby("user_id", sort=True):
        st = tuple(st_map.get(str(uid), (0, 0, 0, 0)))
        st_map[str(uid)] = list(_advance_funnel_user(uid, st, sub, out))
    state.update((json.dumps(st_map),))
    if out:
        yield pd.DataFrame(out)[["user_id", "t_view", "t_click",
                                 "t_purchase", "total_secs"]]


def funnel_completions_stream(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    e = _event_stream(spark, sf_dir).select(
        "user_id", "ts", "event_type",
        F.pmod("user_id", F.lit(N_USER_BUCKETS)).alias("ubucket"))
    return (e.groupBy("ubucket")
            .applyInPandasWithState(
                _advance_funnel, FUNNEL_OUTPUT_SCHEMA,
                FUNNEL_STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))


def funnel_completions_stream_q(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """[Q] users who completed view->click->purchase (greedy chain,
    72 h per-step horizon) with their step timestamps — the streaming
    twin of operators/funnel, emitted incrementally as completions
    happen instead of recomputed per batch. Unlike the sessionizer
    there is no open-tail caveat: a completion is final the moment the
    purchase lands, so stream output == batch chain exactly."""
    out = run_available_now(
        funnel_completions_stream(spark, sf_dir), _next_sink())
    return out.select("user_id", "t_view", "t_click", "t_purchase",
                      "total_secs")


FUNNEL_COMPLETIONS_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
s1 AS (SELECT user_id, min(ts) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
       JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t1
         AND e.ts <= s1.t1 + INTERVAL {FUNNEL_HORIZON_HOURS} HOUR
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
       JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
         AND e.ts <= s2.t2 + INTERVAL {FUNNEL_HORIZON_HOURS} HOUR
       GROUP BY e.user_id)
SELECT s1.user_id,
       strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS t_view,
       strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS t_click,
       strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS t_purchase,
       CAST(floor(epoch(s3.t3 - s1.t1)) AS BIGINT) AS total_secs
FROM s3 JOIN s2 USING (user_id) JOIN s1 USING (user_id)
"""
