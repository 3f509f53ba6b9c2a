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
