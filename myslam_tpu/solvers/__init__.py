from . import initializer, pnp, sim3_solver  # noqa: F401
