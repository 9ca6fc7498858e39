from .registry import all_oracles, all_queries, query

__all__ = ["all_oracles", "all_queries", "query"]
