"""Headless visualization: the reference's Pangolin/OpenCV viewer stack
(Viewer/FrameDrawer/MapDrawer, reference src/Viewer.cc, src/FrameDrawer.cc,
src/MapDrawer.cc) re-imagined for a headless TPU deployment — frames and
map renders become numpy images / PNG artifacts instead of a GL window."""

from .frame_drawer import FrameDrawer  # noqa: F401
from .map_drawer import MapDrawer      # noqa: F401
from .viewer import Viewer             # noqa: F401
