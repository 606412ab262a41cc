from . import se3, sim3, projection, triangulation, epipolar  # noqa: F401
