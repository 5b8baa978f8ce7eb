from .readers import STAR_TABLES, load_star, read_table, register_star_views
from .writers import write_bucketed, write_table

__all__ = [
    "STAR_TABLES",
    "load_star",
    "read_table",
    "register_star_views",
    "write_bucketed",
    "write_table",
]
