from .glenet import GLENet  # noqa: F401
