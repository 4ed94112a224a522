"""The bounded-memory streaming dedup gate on Spark 4's
``transformWithStateInPandas`` — the typed-state successor API that
:func:`pipelines.streaming_dedup_admission` (applyInPandasWithState)
documented it would move to "when protobuf is available". Round 4
made it available without the package: the state-server protocol is
served by ``protolite``/``state_proto_shim`` (a bounded protobuf
runtime reimplementation, same playbook as sinks/pgwire.py).

Semantics are IDENTICAL to the applyInPandasWithState form (pinned by
the side-by-side integration test): per user, an event is ADMITTED
iff its content digest is not among that user's last ``n_recent``
admitted digests, FIFO-evicted, so state is exactly n_recent digests
per active key no matter the stream age. The state moves from the old
API's tuple blob to a typed ValueState handle; with TTL support in
this API, eviction-by-time becomes a one-line ``ttlDurationMs`` when
a deployment wants horizon-by-age instead of by-count.

Run the owning query with the RocksDB state-store provider
(``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``)
— transformWithState requires it; the JVM side ships rocksdbjni.
"""

from __future__ import annotations

from etl_property_rumah123_spark.streaming import state_proto_shim

# Driver-side install at import; workers re-run this module's import
# when they unpickle the processor (its class lives here), and init()
# installs again for belt and braces.
state_proto_shim.install()

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

from etl_property_rumah123_spark.streaming.pipelines import (  # noqa: E402
    DEDUP_GATE_SCHEMA,
)


class DedupGateProcessor(StatefulProcessor):
    """Per-key FIFO digest-horizon admission (see module docstring)."""

    def __init__(self, n_recent: int = 128):
        self.n_recent = n_recent

    def init(self, handle: StatefulProcessorHandle) -> None:
        state_proto_shim.install()
        self._seen = handle.getValueState("seen", "digests array<string>")

    def handleInputRows(self, key, rows, timer_values):
        from collections import deque

        import pandas as pd

        existing = self._seen.get() if self._seen.exists() else None
        seen = deque(existing[0] if existing else [], maxlen=self.n_recent)
        sset = set(seen)
        out_e, out_d = [], []
        for pdf in rows:
            for eid, dg in zip(pdf["event_id"], pdf["digest"]):
                if dg in sset:
                    continue
                if len(seen) == self.n_recent:  # FIFO eviction, inline
                    sset.discard(seen[0])  # so the bound holds mid-batch
                sset.add(dg)
                seen.append(dg)
                out_e.append(int(eid))
                out_d.append(dg)
        self._seen.update((list(seen),))
        if out_e:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_e),
                    "event_id": out_e,
                    "digest": out_d,
                }
            )

    def close(self) -> None:
        pass


def streaming_dedup_admission_tws(
    events: DataFrame, n_recent: int = 128
) -> DataFrame:
    """The admission gate on transformWithStateInPandas. Same input/
    output contract as ``pipelines.streaming_dedup_admission``."""
    prepared = events.select(
        "user_id",
        "event_id",
        F.md5(F.coalesce(F.col("props"), F.lit(""))).alias("digest"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        DedupGateProcessor(n_recent),
        outputStructType=DEDUP_GATE_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


class ListStateGateProcessor(StatefulProcessor):
    """The same FIFO digest-horizon gate with the state held in a
    typed ListState — one (digest) row per remembered entry instead of
    one array blob — exercising the list-state protocol surface
    (ListStateGet with its iterator paging, ListStatePut, AppendList)
    through the protolite shim, plus a processing-time TIMER that
    clears state for keys idle past ``idle_ttl_ms`` (the timer
    register/expire round-trip: RegisterTimer, DeleteTimer, expiry
    delivery into handleExpiredTimer).

    Admissions are pinned identical to :class:`DedupGateProcessor` by
    the integration test; list-vs-value state and timers change only
    HOW the horizon is stored and aged, never what is admitted.
    """

    def __init__(self, n_recent: int = 128, idle_ttl_ms: int | None = None):
        self.n_recent = n_recent
        self.idle_ttl_ms = idle_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        state_proto_shim.install()
        self._handle = handle
        self._seen = handle.getListState("seen_list", "digest string")

    def handleInputRows(self, key, rows, timer_values):
        from collections import deque

        import pandas as pd

        seen = deque(
            (r[0] for r in (self._seen.get() if self._seen.exists() else [])),
            maxlen=self.n_recent,
        )
        sset = set(seen)
        out_e, out_d = [], []
        for pdf in rows:
            for eid, dg in zip(pdf["event_id"], pdf["digest"]):
                if dg in sset:
                    continue
                if len(seen) == self.n_recent:
                    sset.discard(seen[0])
                sset.add(dg)
                seen.append(dg)
                out_e.append(int(eid))
                out_d.append(dg)
        self._seen.put([(d,) for d in seen])
        if self.idle_ttl_ms is not None:
            self._handle.registerTimer(
                timer_values.getCurrentProcessingTimeInMs() + self.idle_ttl_ms
            )
        if out_e:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_e),
                    "event_id": out_e,
                    "digest": out_d,
                }
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # noqa: N803
        # (pyspark invokes with camelCase keywords)
        # idle horizon passed with no new batch re-registering: forget
        self._seen.clear()
        self._handle.deleteTimer(expiredTimerInfo.getExpiryTimeInMs())
        return iter(())

    def close(self) -> None:
        pass


def streaming_dedup_admission_tws_list(
    events: DataFrame, n_recent: int = 128, idle_ttl_ms: int | None = None
) -> DataFrame:
    """The admission gate over ListState + timers (see
    :class:`ListStateGateProcessor`)."""
    prepared = events.select(
        "user_id",
        "event_id",
        F.md5(F.coalesce(F.col("props"), F.lit(""))).alias("digest"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        ListStateGateProcessor(n_recent, idle_ttl_ms),
        outputStructType=DEDUP_GATE_SCHEMA,
        outputMode="append",
        timeMode="processingTime" if idle_ttl_ms is not None else "none",
    )
