"""Custom stateful streaming operator (SURVEY §2.10 engine extension):
per-conversation incremental mention tracking with
``applyInPandasWithState``.

For each conv_id the state holds (max_turn_idx, persons already reported);
every micro-batch emits only NEWLY seen persons for the conversation —
the streaming analogue of stage 1's repeatOK=False first-hit semantics
(Utilities.py:60-65), maintained incrementally instead of per-batch.
State is evicted after ``ttl_minutes`` of processing-time inactivity
(GroupStateTimeout.ProcessingTimeTimeout), bounding state for the
10^12-turn posture where conversations eventually go quiet. Pass
``ttl_minutes=0`` for NoTimeout — bounded drains (availableNow) otherwise
wait for the processing-time horizon.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.matcher import SurfaceIndexHandle

_OUT_SCHEMA = "conv_id string, person string, first_turn_idx int"
_STATE_SCHEMA = "max_turn int, persons array<string>"


def incremental_conv_mentions(
    stream: DataFrame, index: SurfaceIndexHandle, ttl_minutes: int = 30
) -> DataFrame:
    """→ streaming (conv_id, person, first_turn_idx): each person emitted
    once per conversation, at the first turn where any of their surfaces
    appears."""
    getter = index.worker_getter()
    use_ttl = ttl_minutes > 0

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        idx = getter()
        if state.exists:
            max_turn, persons = state.get
            seen = set(persons)
        else:
            max_turn, seen = -1, set()

        out_rows = []
        # concat THEN sort: applyInPandasWithState delivers the group as
        # chunks with no cross-chunk order promise — sorting each chunk
        # independently would pin first_turn_idx to whichever chunk came
        # first, not the conversation's actual first mentioning turn
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            ordered = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values("turn_idx")
            for turn_idx, text in zip(ordered["turn_idx"], ordered["text"]):
                if not isinstance(text, str):
                    continue
                max_turn = max(max_turn, int(turn_idx))
                for person in idx.distinct_persons_in(text):
                    if person not in seen:
                        seen.add(person)
                        out_rows.append((conv_id, person, int(turn_idx)))

        state.update((max_turn, sorted(seen)))
        if use_ttl:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["conv_id", "person", "first_turn_idx"])

    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_ttl
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
