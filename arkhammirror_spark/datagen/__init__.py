from .pages import PAGE_KINDS, gen_pages_df, gen_pages_pandas, write_pages

__all__ = ["PAGE_KINDS", "gen_pages_df", "gen_pages_pandas", "write_pages"]
