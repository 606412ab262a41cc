from . import frame, extractor  # noqa: F401
