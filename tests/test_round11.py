"""Round-11 additions: connector rate limiting (SURVEY OP9 — the
reference throttles its REST source at 20 req/s, hankook_api.py:105).
The custom DataSources already modeled offsets and partition parallelism;
these tests pin the new token-bucket knob: values identical with and
without throttling, and a throttled scan takes at least the token-paced
floor."""

from __future__ import annotations

import time
import types

from ccirecommenderdatapipeline_spark.sources import broker


def _scan(spark, **opts):
    broker.register(spark)
    r = spark.read.format("broker_balances")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_throttled_scan_is_value_identical(spark):
    plain = sorted(map(tuple, _scan(spark, n_symbols=12).collect()))
    slow = sorted(
        map(tuple, _scan(spark, n_symbols=12, max_rps=1000).collect())
    )
    assert plain == slow and len(plain) == 24


def test_token_bucket_paces_requests():
    """Exercise the bucket WITHOUT Spark job overhead (ADVICE r11 item 1:
    the old Spark-level timing was vacuous — ``partitions()`` split 12
    symbols into 12 single-partition reads, each with a fresh burst-1
    bucket whose first token is free, so nothing ever paced and the 0.4 s
    floor was met by job overhead alone). Here the reader is driven
    directly on ONE 12-symbol partition, the
    test_stream_feed_throttle_state_paces_polls pattern: 11 paced
    requests at 50 req/s with burst 1 -> >= 0.22 s wall clock (0.20 s
    floor for timer slop), while the unthrottled read of the same
    partition — a pure-arithmetic generator — stays far under the floor,
    proving the floor comes from ``bucket.acquire()`` and not from
    harness overhead."""
    src_cls = broker.make_source()
    part = types.SimpleNamespace(start=1, end=13, accounts=1)

    throttled_reader = src_cls(
        {"n_symbols": "12", "n_accounts": "1", "max_rps": "50", "burst": "1"}
    ).reader(None)
    t0 = time.monotonic()
    rows = list(throttled_reader.read(part))
    paced = time.monotonic() - t0

    plain_reader = src_cls({"n_symbols": "12", "n_accounts": "1"}).reader(None)
    t0 = time.monotonic()
    rows_plain = list(plain_reader.read(part))
    free = time.monotonic() - t0

    assert len(rows) == 12 and rows == rows_plain
    assert paced >= 0.20, f"throttle did not pace: {paced:.3f}s"
    assert free < 0.10, f"unthrottled read unexpectedly slow: {free:.3f}s"


def test_stream_feed_throttle_state_paces_polls():
    """Driver-side poll pacing for the streaming feed: with max_rps=50
    and burst 1, 5 consecutive read() polls cost >= 4 tokens ~ 0.08 s."""
    src_cls = __import__(
        "ccirecommenderdatapipeline_spark.sources.execution_feed",
        fromlist=["make_stream_source"],
    ).make_stream_source()
    reader = src_cls({"total": "50", "batch": "10", "max_rps": "50"}).simpleStreamReader(None)
    t0 = time.monotonic()
    off = reader.initialOffset()
    for _ in range(5):
        rows, off = reader.read(off)
    elapsed = time.monotonic() - t0
    assert off == {"next_id": 50}
    assert elapsed >= 0.06, f"poll pacing missing: {elapsed:.3f}s"
