from .tables import load_table, load_tables
from .prices import prices_view, PRICES_ORACLE_CTE

__all__ = ["load_table", "load_tables", "prices_view", "PRICES_ORACLE_CTE"]
