"""Custom Python DataSource WRITER (pyspark.sql.datasource, Spark 4): the
engine's mapping for the reference's order-submission sink (SURVEY S8 —
hankook_api.py's order POST path). A live connector would POST each order
row to the broker API with retry/backoff; this fixture writer lands each
executor partition as one JSON-lines file and finalizes with a driver-side
commit manifest — the same two-phase task-commit protocol a real sink
needs for exactly-once under task retries (uncommitted files are ignored
by readers until the manifest lists them).

Packaging note: classes built inside ``make_sink()`` so they pickle by
value to executor workers (same rationale as sources/broker.py).
"""

from __future__ import annotations

LEDGER_FORMAT = "order_ledger"


def make_sink():
    import json
    import os
    import uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Committed(WriterCommitMessage):
        def __init__(self, filename: str, n_rows: int):
            self.filename, self.n_rows = filename, n_rows

    class LedgerWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            # one JSONL file per task, named uniquely so a retried task
            # never clobbers a committed attempt
            os.makedirs(self.path, exist_ok=True)
            fname = f"part-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, fname), "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return _Committed(fname, n)

        def commit(self, messages):
            # two-phase finalize: only files named here are visible
            manifest = {
                "files": sorted(m.filename for m in messages if m is not None),
                "rows": sum(m.n_rows for m in messages if m is not None),
            }
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                json.dump(manifest, f)

        def abort(self, messages):
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.filename))
                    except OSError:
                        # best-effort abort cleanup: a part file another
                        # task already removed (or never wrote) is fine —
                        # the absent _MANIFEST.json is what marks the
                        # write failed, not the stray parts
                        pass

    class LedgerSink(DataSource):
        """df.write.format("order_ledger").option("path", dir).save()"""

        @classmethod
        def name(cls) -> str:
            return LEDGER_FORMAT

        def writer(self, schema, overwrite: bool) -> DataSourceWriter:
            return LedgerWriter(self.options)

    return LedgerSink


def register(spark) -> None:
    spark.dataSource.register(make_sink())


def read_ledger(spark, path: str, schema_ddl: str):
    """Manifest-gated read-back: only task-committed files are visible."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, fn) for fn in manifest["files"]]
    return spark.read.schema(schema_ddl).json(files)
