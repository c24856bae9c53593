"""ouster_sdk_tpu: a TPU-native lidar SDK with the capabilities of the
Ouster SDK, rebuilt around JAX/XLA/Pallas.

The hot data path — packet bit-unpack, scan assembly, destagger, XYZ
projection, SE(3) dewarp — runs as fused kernels on device; host-side code
handles UDP/pcap/OSF ingest and the streaming state machines.
"""

__version__ = "0.1.0"

from .core.types import (  # noqa: F401
    DataFormat,
    HeaderType,
    LidarMode,
    SensorConfig,
    SensorInfo,
    TimestampMode,
    OperatingMode,
    UDPProfileIMU,
    UDPProfileLidar,
    Version,
)
from .core.constants import ChanField, RANGE_UNIT  # noqa: F401
from .core.field import FieldClass, FieldType  # noqa: F401
from .core.lidar_scan import LidarScan, get_field_types  # noqa: F401
from .core.batcher import ScanBatcher  # noqa: F401
from .core.packets import (  # noqa: F401
    ImuPacket,
    LidarPacket,
    Packet,
    PacketValidationFailure,
    ZonePacket,
)
from .core.metadata import (  # noqa: F401
    ValidatorIssues,
    parse_and_validate_config,
    parse_and_validate_metadata,
    parse_config,
    sensor_info_from_metadata,
)
from .ops.packet_format import PacketFormat, PacketWriter  # noqa: F401
from .io.sources import (  # noqa: F401
    IoType,
    LidarScanSet,
    ScanSource,
    collate_scans,
    io_type,
    open_packet_source,
    open_source,
)
from .ops.destagger import destagger, stagger  # noqa: F401
from .ops.xyzlut import XYZLut, make_xyz_lut  # noqa: F401


def XYZLutFactory(info, use_extrinsics: bool = False):
    """Reference-compatible LUT constructor returning a callable that maps a
    scan or range image to (H, W, 3) points (ref: sdk/core/data.py:129
    XYZLut)."""
    lut = make_xyz_lut(info, use_extrinsics)

    def project(scan_or_range):
        import numpy as _np

        if hasattr(scan_or_range, "field"):
            rng = scan_or_range.field(ChanField.RANGE)
        else:
            rng = _np.asarray(scan_or_range)
        return lut(rng)

    return project
