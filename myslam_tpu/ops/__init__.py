from . import image, fast, orientation, descriptors, selection, hamming  # noqa: F401
