"""Round-11 additions: connector rate limiting (SURVEY OP9 — the
reference throttles its REST source at 20 req/s, hankook_api.py:105).
The custom DataSources already modeled offsets and partition parallelism;
these tests pin the new token-bucket knob: values identical with and
without throttling, and a throttled scan takes at least the token-paced
floor."""

from __future__ import annotations

import time

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


def test_token_bucket_paces_requests(spark):
    """12 symbols on one partition at 20 req/s with burst 1: 11 paced
    requests -> >= 0.55 s wall clock (generous 0.4 s floor for timer
    slop); the unthrottled scan of the same range is far under it."""
    t0 = time.monotonic()
    n = _scan(
        spark, n_symbols=12, n_accounts=1, max_rps=20, burst=1
    ).coalesce(1).count()
    throttled = time.monotonic() - t0
    assert n == 12
    assert throttled >= 0.4, f"throttle did not pace: {throttled:.3f}s"
    # NOTE: no unthrottled-is-faster comparison — two wall clocks under
    # suite-wide load race each other (flaked in the full run); the
    # pacing FLOOR above is the contract, and value-identity is pinned
    # by test_throttled_scan_is_value_identical


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
