"""AOT export / serving artifacts (see ``serving/export.py``)."""

from .export import (  # noqa: F401
    build_sampler_fn,
    export_sampler,
    load_artifact,
    save_artifact,
)
