from . import yolo  # noqa: F401
