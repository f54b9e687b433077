"""Custom stateful streaming operator: first-seen dedup over a key.

``applyInPandasWithState`` keeps one tiny state row per key (the set is
bounded by distinct keys, and a timeout can expire idle keys). The
example operator emits only the FIRST document seen for each content
fingerprint — streaming exact-dedup, the incremental complement of
functions/dedup.exact_dedup — so an append-only ingest never re-admits
a page whose text already arrived.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# output carries only what the operator can truthfully report: the
# first-seen row per key. (A dropped-duplicate count was removed — rows
# are only ever emitted on first sight of a key, so the count column was
# structurally always 0 and misleading.)
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("text_md5", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), True)])


def _first_seen(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (seen,) = state.get if state.exists else (False,)
    out = []
    for pdf in batches:
        for url in pdf["url"]:
            if not seen:
                seen = True
                out.append((key[0], url))
    state.update((seen,))
    if out:
        yield pd.DataFrame(out, columns=["text_md5", "url"])


def first_seen_dedup_stream(pages: DataFrame) -> DataFrame:
    """Streaming frame (url, text_md5, ...) -> first occurrence per md5.

    Grouped by content fingerprint; state is one (bool, count) per key.
    Output mode must be ``update`` or ``append`` via the caller's sink.
    """
    return pages.groupBy("text_md5").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
