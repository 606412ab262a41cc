from . import matcher, vocabulary  # noqa: F401
