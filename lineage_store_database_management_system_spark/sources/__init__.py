from .readers import STAR_TABLES, load_star, read_table, register_star_views

__all__ = ["STAR_TABLES", "load_star", "read_table", "register_star_views"]
