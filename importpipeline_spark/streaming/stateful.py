"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming state (SURVEY.md §2.12); this implements the
canonical custom-stateful pattern the rebuilt engine offers on top of
Structured Streaming: per-key crawl *sessionization* — consecutive page
fetches from the same host are grouped into sessions that close after a gap
timeout, emitting (host, session_start, session_end, n_pages) rows.

State is one running session per host; late/out-of-order events within the
watermark extend the open session. This is the template for any custom
stateful op (rate limiting, dedup windows, trend counters) the reference's
per-record pipeline could not express.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "host string, session_start timestamp, session_end timestamp, n_pages long"
)
STATE_SCHEMA = "start long, end long, n long"

GAP_SECONDS = 1800


def sessionize(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Grouped-map-with-state function for host sessionization.

    Input rows: (host, warc_ts). Emits closed sessions; keeps the open one in
    state. Uses processing-time timeout to flush idle hosts.
    """
    host = key[0]
    if state.hasTimedOut:
        (start, end, n) = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "host": [host],
                "session_start": [pd.Timestamp(start, unit="s")],
                "session_end": [pd.Timestamp(end, unit="s")],
                "n_pages": [n],
            }
        )
        return

    ts_all = []
    for pdf in pdfs:
        ts_all.extend(int(t.timestamp()) for t in pdf["warc_ts"])
    if not ts_all:
        return
    ts_all.sort()

    if state.exists:
        start, end, n = state.get
    else:
        start, end, n = ts_all[0], ts_all[0], 0

    out_rows = []
    for t in ts_all:
        if t - end > GAP_SECONDS:
            out_rows.append((start, end, n))
            start, end, n = t, t, 1
        else:
            end = max(end, t)
            n += 1
    state.update((start, end, n))
    state.setTimeoutDuration(GAP_SECONDS * 1000)
    if out_rows:
        yield pd.DataFrame(
            {
                "host": [host] * len(out_rows),
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in out_rows],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in out_rows],
                "n_pages": [c for _, _, c in out_rows],
            }
        )


def host_sessions_stream(pages_stream):
    """pages stream → closed crawl sessions per host."""
    from pyspark.sql import functions as F

    hosts = pages_stream.select(
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
        "warc_ts",
    )
    return hosts.groupBy("host").applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
