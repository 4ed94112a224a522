"""Stateful streaming operators on Spark 4's
``transformWithStateInPandas`` — the typed-state successor API that
:func:`pipelines.streaming_dedup_admission` (applyInPandasWithState)
documented it would move to "when protobuf is available". Round 4
made it available without the package: the state-server protocol is
served by ``protolite``/``state_proto_shim`` (a bounded protobuf
runtime reimplementation, same playbook as sinks/pgwire.py).

Coverage of the new API's surface, each integration-tested against
the real RocksDB state server:

- **ValueState** — :class:`DedupGateProcessor`, the bounded-memory
  dedup admission gate, admissions pinned IDENTICAL to the
  applyInPandasWithState form;
- **ListState** — :class:`ListStateGateProcessor`, the same gate with
  one state row per remembered digest (list get/put paging on the
  wire);
- **processing-time timers** — the list gate's ``idle_ttl_ms``:
  RegisterTimer/DeleteTimer/expiry delivery, proven observably (idle
  keys forget their horizon, so replayed content is re-admitted);
- **MapState** — :class:`TypeCountsProcessor`, per-user per-type
  running accumulators (ContainsKey/GetValue/UpdateValue + map
  iterator paging), pinned equal to the batch groupBy;
- **state TTL** — ``state_ttl_ms`` on the value gate (TTLConfig on
  the wire): idle horizons expire wholesale, replays re-admit;
- **initial state** — ``initial_admitted`` bootstraps each key's
  horizon from a batch DataFrame via ``handleInitialState`` before
  batch 0 (a restarted/migrated gate keeps its history).

The gate semantics: per user, an event is ADMITTED iff its content
digest is not among that user's last ``n_recent`` admitted digests,
FIFO-evicted, so state is exactly n_recent digests per active key no
matter the stream age.

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
    """Per-key FIFO digest-horizon admission (see module docstring).

    ``state_ttl_ms``: optional STATE TTL (the typed-state API's native
    aging — TTLConfig on the wire, carried by the protolite
    nested-assignment semantics): a key's horizon expires wholesale
    after that long without a write, so long-idle users forget their
    history without explicit timers. Requires processingTime timeMode.

    ``handleInitialState``: when the query is started with an
    ``initialState`` GroupedData of (user_id, digest) rows — e.g. the
    digests of an EXISTING admitted corpus — each key's horizon is
    bootstrapped before the first batch, so a restarted/migrated gate
    does not re-admit history it has already passed."""

    def __init__(self, n_recent: int = 128, state_ttl_ms: int | None = None):
        self.n_recent = n_recent
        self.state_ttl_ms = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        state_proto_shim.install()
        self._seen = handle.getValueState(
            "seen", "digests array<string>", ttlDurationMs=self.state_ttl_ms
        )

    def handleInitialState(self, key, initialState, timerValues):  # noqa: N803
        digests = [str(d) for d in initialState["digest"]][-self.n_recent:]
        self._seen.update((digests,))

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
        # An all-duplicates batch leaves the horizon EXACTLY as read
        # (admission is the only mutation), so skip the state write —
        # one fewer state-server round trip + RocksDB put per quiet
        # key per batch, the common case for the gate's design target
        # (dup-heavy replay traffic). NOT skipped under state TTL:
        # there the write IS the aging signal ("expires after that
        # long without a write"), and skipping would let a key serving
        # only duplicates expire mid-traffic.
        if out_e or self.state_ttl_ms is not None:
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
    events: DataFrame,
    n_recent: int = 128,
    state_ttl_ms: int | None = None,
    initial_admitted: DataFrame | None = None,
) -> DataFrame:
    """The admission gate on transformWithStateInPandas. Same input/
    output contract as ``pipelines.streaming_dedup_admission``; see
    :class:`DedupGateProcessor` for ``state_ttl_ms`` (native state
    aging) and ``initial_admitted`` (a batch DataFrame with user_id +
    props whose digests seed each key's horizon before batch 0)."""
    prepared = events.select(
        "user_id",
        "event_id",
        F.md5(F.coalesce(F.col("props"), F.lit(""))).alias("digest"),
    )
    initial = None
    if initial_admitted is not None:
        initial = (
            initial_admitted.select(
                "user_id",
                F.md5(F.coalesce(F.col("props"), F.lit(""))).alias("digest"),
            )
            .groupBy("user_id")
        )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        DedupGateProcessor(n_recent, state_ttl_ms),
        outputStructType=DEDUP_GATE_SCHEMA,
        outputMode="append",
        timeMode="processingTime" if state_ttl_ms is not None else "none",
        initialState=initial,
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
        # same all-duplicates skip as the value-state gate; safe at any
        # idle_ttl because list-state aging is TIMER-driven (re-armed
        # below every batch), never write-driven
        if out_e:
            self._seen.put([(d,) for d in seen])
        if self.idle_ttl_ms is not None:
            # registerTimer ADDS — it never replaces — so the previous
            # batch's timer would still fire idle_ttl after THAT batch
            # and wipe an ACTIVE key's horizon. Delete stale timers
            # before arming the new idle deadline (this also exercises
            # the ListTimers protocol path).
            for expiry_ms in self._handle.listTimers():
                self._handle.deleteTimer(expiry_ms)
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


#: Output schema of the per-(user, event_type) running-count operator.
TYPE_COUNTS_SCHEMA = "user_id long, event_type string, n long, total double"


class TypeCountsProcessor(StatefulProcessor):
    """Per-user MAP state: running (count, value-sum) per event_type —
    the canonical map-state shape (sub-keyed accumulators under one
    grouping key), exercising the remaining third of the typed-state
    protocol through the protolite shim: ContainsKey, GetValue,
    UpdateValue, and the map Iterator/Keys/Values paging
    (StateResponseWithMapIterator / MapKeysOrValues on the wire).
    Emits the FULL current map each batch (update semantics)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        state_proto_shim.install()
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "n long, total double"
        )

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        for pdf in rows:
            for et, v in zip(pdf["event_type"], pdf["value"]):
                et = str(et)
                if self._counts.containsKey((et,)):
                    n, tot = self._counts.getValue((et,))
                else:
                    n, tot = 0, 0.0
                self._counts.updateValue(
                    (et,), (n + 1, tot + (float(v) if v is not None else 0.0))
                )
        types, ns, tots = [], [], []
        for (et,), (n, tot) in self._counts.iterator():
            types.append(et)
            ns.append(n)
            tots.append(tot)
        if types:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(types),
                    "event_type": types,
                    "n": ns,
                    "total": tots,
                }
            )

    def close(self) -> None:
        pass


def streaming_type_counts_tws(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts over MapState (see
    :class:`TypeCountsProcessor`)."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TypeCountsProcessor(),
            outputStructType=TYPE_COUNTS_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
