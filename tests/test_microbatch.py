"""MicroBatcher: coalescing, grouping, ordering, error propagation."""

import threading
import time

import pytest

from mmrs_tpu.microbatch import MicroBatcher


def test_coalesces_concurrent_submits():
    calls = []

    def handler(key, payloads):
        calls.append(list(payloads))
        return [p * 10 for p in payloads]

    mb = MicroBatcher(handler, batch_window=0.2)
    n = 8
    barrier = threading.Barrier(n)
    results = [None] * n

    def one(i):
        barrier.wait(timeout=30)
        results[i] = mb.submit("k", i)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    mb.close()
    assert results == [i * 10 for i in range(n)]
    assert len(calls) < n  # batched: fewer handler calls than submits
    assert sum(len(c) for c in calls) == n


def test_groups_by_key_and_preserves_order():
    seen = {}

    def handler(key, payloads):
        seen.setdefault(key, []).extend(payloads)
        return [(key, p) for p in payloads]

    mb = MicroBatcher(handler, batch_window=0.05)
    out = mb.submit_many("a", [1, 2, 3])
    assert out == [("a", 1), ("a", 2), ("a", 3)]
    assert seen["a"] == [1, 2, 3]
    mb.close()


def test_handler_error_fails_only_its_group():
    def handler(key, payloads):
        if key == "bad":
            raise ValueError("boom")
        return payloads

    mb = MicroBatcher(handler, batch_window=0.01)
    with pytest.raises(ValueError, match="boom"):
        mb.submit("bad", 1)
    # the worker survives and keeps serving other groups
    assert mb.submit("good", 7) == 7
    mb.close()


def test_max_batch_caps_a_drain():
    calls = []

    def handler(key, payloads):
        calls.append(len(payloads))
        return payloads

    mb = MicroBatcher(handler, max_batch=4, batch_window=0.2)
    out = mb.submit_many("k", list(range(10)))
    assert out == list(range(10))
    assert max(calls) <= 4
    mb.close()


def test_wrong_result_count_raises():
    mb = MicroBatcher(lambda key, ps: [1], batch_window=0.0)
    with pytest.raises(RuntimeError, match="results"):
        mb.submit_many("k", [1, 2])
    mb.close()


def test_close_is_idempotent_and_fast():
    mb = MicroBatcher(lambda k, ps: ps)
    assert mb.submit("k", 1) == 1
    t0 = time.monotonic()
    mb.close()
    mb.close()
    assert time.monotonic() - t0 < 1.0


def test_submit_after_close_raises():
    mb = MicroBatcher(lambda k, xs: xs, batch_window=0.001)
    assert mb.submit("k", 1) == 1
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit("k", 2)


def test_close_never_strands_racing_submitters():
    """Submitters racing close() must either complete or raise — never
    hang in done.wait() (review finding: items enqueued after the stop
    sentinel were silently dropped)."""
    import threading
    import time as _time

    mb = MicroBatcher(lambda k, xs: [x * 2 for x in xs],
                      batch_window=0.001)
    outcomes = []

    def pound():
        for i in range(200):
            try:
                outcomes.append(mb.submit("k", i))
            except RuntimeError:
                outcomes.append("closed")
                return

    threads = [threading.Thread(target=pound) for _ in range(4)]
    for t in threads:
        t.start()
    _time.sleep(0.01)
    mb.close()
    for t in threads:
        t.join(timeout=10)
    assert not any(t.is_alive() for t in threads), "submitter stranded"


def test_stage_stats_concurrent_new_stages():
    """as_dict() while other threads create NEW stages must not raise
    (dictionary-changed-size race; the /v1/stats poll path)."""
    import threading
    from mmrs_tpu.utils.stats import StageStats

    stats = StageStats()
    stop = threading.Event()
    errors = []

    def writer(wid):
        i = 0
        while not stop.is_set():
            stats.record(f"stage_{wid}_{i}", 0.001)
            i += 1

    def reader():
        try:
            while not stop.is_set():
                stats.as_dict()
                stats.summary()
        except Exception as e:  # pragma: no cover - the regression
            errors.append(e)

    ts = ([threading.Thread(target=writer, args=(w,)) for w in range(3)]
          + [threading.Thread(target=reader)])
    for t in ts:
        t.start()
    import time as _time

    _time.sleep(0.4)
    stop.set()
    for t in ts:
        t.join(timeout=5)
    assert not errors, errors
