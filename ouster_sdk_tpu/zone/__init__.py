from .zrb import Zrb  # noqa: F401
from .zone import Zone, ZoneSet, ZoneMode  # noqa: F401
from .monitor import render_zone_bounds, zone_occupancy  # noqa: F401
