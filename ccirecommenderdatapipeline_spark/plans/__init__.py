"""Query registry — the driver contract surface.

Importing this package registers every query; ``QUERIES`` / ``ORACLES`` feed
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from .registry import QUERIES, ORACLES, query

from . import cci  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import simulator  # noqa: E402,F401
from . import lifecycle  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import storage  # noqa: E402,F401
from . import mllib  # noqa: E402,F401
from . import broker  # noqa: E402,F401
from . import northstar  # noqa: E402,F401
from . import streaming  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
