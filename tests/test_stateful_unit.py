"""Unit pins for the TWS sessionizer's state round-trip shape (r19).

The r19 optimization replaced per-close ``appendValue`` (one state-server
round-trip per closed session — 95k calls at sf0.1) with ONE
``appendList`` per key-batch. These tests drive ``handleInputRows`` /
``handleExpiredTimer`` against a fake handle and pin that:

* list contents and ORDER are exactly the emitted sessions' starts,
* at most one appendList round-trip happens per key-batch,
* sess_seq stays continuous across batched closes and timer expiry.

The on-cluster contract is separately H-checked by
``scan_state_tws_variables`` (ListState read back against the oracle).
"""

import pandas as pd

from sparkstreamingstateful_spark.streaming import stateful


class FakeValueState:
    def __init__(self):
        self.value = None

    def get(self):
        return self.value

    def update(self, v):
        self.value = tuple(v)


class FakeListState:
    def __init__(self):
        self.rows = []
        self.append_calls = 0
        self.append_list_calls = 0

    def appendValue(self, v):
        self.append_calls += 1
        self.rows.append(tuple(v))

    def appendList(self, vs):
        self.append_list_calls += 1
        self.rows.extend(tuple(v) for v in vs)

    def get(self):
        return iter(self.rows)


class FakeHandle:
    def __init__(self):
        self.value_state = FakeValueState()
        self.list_state = FakeListState()
        self.timers = []

    def getValueState(self, name, schema):
        return self.value_state

    def getListState(self, name, schema):
        return self.list_state

    def registerTimer(self, ms):
        self.timers.append(ms)

    def deleteTimer(self, ms):
        self.timers.remove(ms)


class FakeTimerValues:
    def __init__(self, wm_ms):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm


class FakeExpiredTimerInfo:
    def __init__(self, ms):
        self._ms = ms

    def getExpiryTimeInMs(self):
        return self._ms


def _pdf(ts_us_list):
    return pd.DataFrame(
        {
            "ts": pd.to_datetime([us * 1000 for us in ts_us_list]),
            "event_id": range(len(ts_us_list)),
            "user_id": [7] * len(ts_us_list),
            "event_type": ["view"] * len(ts_us_list),
            "value": [1.0] * len(ts_us_list),
        }
    )


def test_multi_close_batch_is_one_append_list():
    proc = stateful.make_sessionize_processor()
    h = FakeHandle()
    proc.init(h)
    gap = stateful.GAP_US
    # three gap-separated singleton sessions + one open tail
    ts = [0, gap, 2 * gap, 3 * gap]
    out = list(
        proc.handleInputRows((7,), iter([_pdf(ts)]), FakeTimerValues(-1))
    )
    closed = pd.concat(out, ignore_index=True)
    # first three sessions closed inline, seq 0..2, in event order
    assert list(closed["sess_start_us"]) == [0, gap, 2 * gap]
    assert list(closed["sess_seq"]) == [0, 1, 2]
    # ONE appendList round-trip carried all three starts, in order
    assert h.list_state.append_list_calls == 1
    assert h.list_state.append_calls == 0
    assert h.list_state.rows == [(0,), (gap,), (2 * gap,)]
    # open session for the tail event, timer armed at last + gap
    assert h.value_state.value[0] == 3 * gap
    assert h.timers == [3 * gap // 1000 + stateful.GAP_MS]


def test_expiry_seq_agrees_with_batched_list():
    proc = stateful.make_sessionize_processor()
    h = FakeHandle()
    proc.init(h)
    gap = stateful.GAP_US
    list(proc.handleInputRows((7,), iter([_pdf([0, gap, 2 * gap])]),
                              FakeTimerValues(-1)))
    deadline_ms = 2 * gap // 1000 + stateful.GAP_MS
    out = list(
        proc.handleExpiredTimer((7,), FakeTimerValues(deadline_ms),
                                FakeExpiredTimerInfo(deadline_ms))
    )
    final = pd.concat(out, ignore_index=True)
    # the expiry-path seq derives from the LIST's length (2 batched
    # closes), cross-checking the appendList bookkeeping
    assert list(final["sess_start_us"]) == [2 * gap]
    assert list(final["sess_seq"]) == [2]
    assert h.list_state.rows == [(0,), (gap,), (2 * gap,)]
    # value state retired with lifetime close count
    assert h.value_state.value[0] == -1
    assert h.value_state.value[5] == 3


def test_no_close_batch_appends_nothing():
    proc = stateful.make_sessionize_processor()
    h = FakeHandle()
    proc.init(h)
    out = list(
        proc.handleInputRows((7,), iter([_pdf([0, 1000, 2000])]),
                             FakeTimerValues(-1))
    )
    assert pd.concat(out, ignore_index=True).empty
    assert h.list_state.append_list_calls == 0
    assert h.list_state.append_calls == 0
