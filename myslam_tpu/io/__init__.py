from . import synthetic, trajectory  # noqa: F401
