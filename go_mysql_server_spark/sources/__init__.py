from .tables import TABLES, load, register_all

__all__ = ["TABLES", "load", "register_all"]
