from .pages import read_pages, read_table, register_views

__all__ = ["read_pages", "read_table", "register_views"]
