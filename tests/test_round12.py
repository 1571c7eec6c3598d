"""Round-12 contracts: the short-page drain predicate for the execution
feed (plans/broker.py:q_stream_execution_feed stops the run loop as soon
as a run delivers fewer rows than a full page — no empty probe run)."""

from __future__ import annotations


def _feed_reader(total: int, batch: int):
    src_cls = __import__(
        "ccirecommenderdatapipeline_spark.sources.execution_feed",
        fromlist=["make_stream_source"],
    ).make_stream_source()
    return src_cls({"total": str(total), "batch": str(batch)}).simpleStreamReader(None)


def _drain_pages(total: int, batch: int) -> list[int]:
    """One read() per availableNow run (the simple-reader prefetch shape);
    stop on the query's short-page predicate `rows_this_run < page`."""
    reader = _feed_reader(total, batch)
    off = reader.initialOffset()
    pages = []
    while True:
        rows, off = reader.read(off)
        n = len(list(rows))
        pages.append(n)
        if n < batch:
            break
    return pages


def test_short_page_drain_is_three_runs_at_query_constants():
    # the query's fixture constants: 1000 rows in 373-row pages
    pages = _drain_pages(1000, 373)
    assert pages == [373, 373, 254], pages
    assert sum(pages) == 1000


def test_short_page_drain_exact_divisor_needs_empty_probe():
    # when total % batch == 0 the last full page can't signal the end —
    # the predicate pays exactly one empty probe run, never stops early
    pages = _drain_pages(12, 4)
    assert pages == [4, 4, 4, 0], pages
    assert sum(pages) == 12


def test_short_page_drain_single_run_when_page_exceeds_total():
    pages = _drain_pages(5, 100)
    assert pages == [5], pages


def test_drained_rows_are_exactly_once_and_complete():
    reader = _feed_reader(1000, 373)
    off = reader.initialOffset()
    seen: list[int] = []
    while True:
        rows, off = reader.read(off)
        chunk = [r[0] for r in rows]
        seen.extend(chunk)
        if len(chunk) < 373:
            break
    assert seen == list(range(1000))
