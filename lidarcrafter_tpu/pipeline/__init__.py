from .temporal import TemporalRollout  # noqa: F401
