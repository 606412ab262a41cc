from . import local_mapping, map_store  # noqa: F401
