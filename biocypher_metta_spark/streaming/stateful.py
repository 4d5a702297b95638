"""Custom stateful streaming operators via applyInPandasWithState.

The incremental path (incremental.py) covers stateless extraction and
watermarked dedup; this module adds the remaining streaming capability
class from the north rule: arbitrary per-key state maintained across
micro-batches with Arrow-batched Python (no per-row Python). The shipped
operator keeps running (n_mentions, score_sum) totals per linked entity —
the streaming twin of linking.entity_mention_counts, emitting refreshed
totals every micro-batch instead of recomputing history.

Scale notes: state lives in the state store partitioned by the groupBy
key (entity), so hub entities are single-key hot spots ONLY in the state
update, which is O(batch rows) — the heavy aggregation is the map-side
partial count within each micro-batch, same as the batch path. State is
two scalars per entity: 10^8 entities is a few GB across executors.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "entity string, n_mentions long, score_sum double"
STATE_SCHEMA = "n long, s double"


def _update_entity_totals(key: tuple, pdfs: Iterable[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(len(pdf))
        s += float(pdf["score"].sum()) if len(pdf) else 0.0
    state.update((n, s))
    yield pd.DataFrame({"entity": [key[0]], "n_mentions": [n],
                        "score_sum": [s]})


def running_entity_counts(linked_stream: DataFrame) -> DataFrame:
    """linked mentions stream (doc_id, mention, entity, score) -> running
    per-entity totals, one refreshed row per entity per micro-batch.
    Use outputMode('update'); totals accumulate across batches through
    the checkpointed state store (exactly-once on replay)."""
    return (linked_stream
            .groupBy("entity")
            .applyInPandasWithState(
                _update_entity_totals, OUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
