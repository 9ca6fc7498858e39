from .transpiler import transpile_select

__all__ = ["transpile_select"]
