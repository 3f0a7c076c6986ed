from .tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "streams",
]


def __getattr__(name):
    # lazy: streams pulls in the streaming package, which imports back
    # into sources — deferring breaks the cycle without import-order tricks
    if name == "streams":
        import importlib

        mod = importlib.import_module(".streams", __name__)
        globals()["streams"] = mod
        return mod
    raise AttributeError(name)
