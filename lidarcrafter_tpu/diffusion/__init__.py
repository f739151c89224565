from . import schedules  # noqa: F401
from .continuous import ContinuousDiffusion  # noqa: F401
