"""Streaming event analytics: the stateful twin of the batch funnel query.

``funnel_stages`` tracks each user's progress through an ordered event
funnel (e.g. view -> click -> purchase) over a Structured Streaming event
source, emitting an update row whenever a user advances a stage. State is
one tiny row per user in the streaming state store — at scale this is the
standard keyed-state layout (hash-partitioned by user, no global state).

Semantics vs the batch query (suite_ext3.ev_funnel_conversion): stage s+1
is reached by the FIRST event of type stages[s+1] with ts STRICTLY after
the ts that fulfilled stage s. Within a micro-batch events are processed in
ts order, so intra-batch disorder is repaired exactly; an event arriving in
a LATER batch than one it precedes cannot rewrite fulfilled history (the
stage machine is monotone) — the same contract a watermark gives windowed
aggregates. On a bounded, fully-delivered source the final per-user stages
equal the batch query's.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


DEFAULT_STAGES = ("view", "click", "purchase")


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...] = DEFAULT_STAGES,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel progress over a streaming event frame.

    Output (update mode): ``(user_id, stage, stage_ts)`` — the highest
    1-based stage reached so far and the event time that fulfilled it; a
    row is emitted only for users whose stage advanced in the micro-batch.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    stage_of = {name: i + 1 for i, name in enumerate(stages)}

    ev = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("timestamp_ntz").alias("ts"),
    ).where(F.col(type_col).isin(list(stages)))

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("stage", LongType()),
            StructField("stage_ts", TimestampNTZType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("stage", LongType()),
            # epoch micros of the fulfilling event (state rows must be flat)
            StructField("stage_ts_us", LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        (user_id,) = key
        if state.exists:
            stage, ts_us = state.get
        else:
            stage, ts_us = 0, -1
        rows = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                rows.append((r.ts, r.event_type))
        advanced = False
        for ts, etype in sorted(rows, key=lambda r: r[0]):
            if stage >= len(stages):
                break
            cur_us = int(pd.Timestamp(ts).value // 1000)
            if stage_of.get(etype) == stage + 1 and cur_us > ts_us:
                stage += 1
                ts_us = cur_us
                advanced = True
        state.update((stage, ts_us))
        if advanced:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "stage": stage,
                        "stage_ts": pd.Timestamp(ts_us * 1000),
                    }
                ]
            )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
