"""ouster_sdk_tpu: a TPU-native lidar SDK with the capabilities of the
Ouster SDK, rebuilt around JAX/XLA/Pallas.

The hot data path — packet bit-unpack, scan assembly, destagger, XYZ
projection, SE(3) dewarp — runs as fused kernels on device; host-side code
handles UDP/pcap/OSF ingest and the streaming state machines.
"""

__version__ = "0.5.0"

from .core.types import (  # noqa: F401
    INVALID_VERSION,
    BloomReductionOptimization,
    CalibrationStatus,
    DataFormat,
    FullScaleRange,
    HeaderType,
    LidarMode,
    MultipurposeIOMode,
    NMEABaudRate,
    OperatingMode,
    Polarity,
    ProductInfo,
    ReturnOrder,
    SensorConfig,
    SensorInfo,
    ShotLimitingStatus,
    ThermalShutdownStatus,
    TimestampMode,
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
    PacketType,
    PacketValidationFailure,
    ZonePacket,
)
from .core.metadata import (  # noqa: F401
    ValidatorEntry,
    ValidatorIssues,
    parse_and_validate_config,
    parse_and_validate_metadata,
    parse_and_validate_sensor_config,
    parse_config,
    sensor_info_from_metadata,
)
from .core.error_handler import Severity  # noqa: F401
from .core.logging import init_logger  # noqa: F401
from .core.scans import Packets, Scans  # noqa: F401
from .core.scan_utils import (  # noqa: F401
    BufferT,
    ColHeader,
    FrameBorder,
    first_valid_column_pose,
    last_valid_column_pose,
    packet_ts,
    poses_present,
    valid_packet_idxs,
)
from .ops.packet_format import PacketFormat, PacketWriter  # noqa: F401
from .io.sources import (  # noqa: F401
    Collator,
    IoType,
    Singler,
    Slicer,
    SourceURLException,
    LidarScanSet,
    MultiScanSource,
    OusterIoType,
    PacketSource,
    ScanSource,
    collate,
    collate_scans,
    extension_from_io_type,
    io_type,
    io_type_from_extension,
    open_packet_source,
    open_source,
    populate_extrinsics,
)
from .io.derived import (  # noqa: F401
    ClippedScanSource,
    MaskedScanSource,
    ReducedScanSource,
)
from .io.cloud_io import read_pointcloud  # noqa: F401
from .ops.destagger import destagger, stagger  # noqa: F401
from .ops.xyzlut import make_xyz_lut, make_xyz_lut_float  # noqa: F401
from .ops.image_processing import (  # noqa: F401
    AutoExposure,
    BeamUniformityCorrector,
)
from .ops.downsample import voxel_downsample  # noqa: F401
from .ops.normals import normals  # noqa: F401
from .ops.normals_jax import normals_jax  # noqa: F401
from .ops.profiles import FieldInfo, add_custom_profile  # noqa: F401
from .sensor.http import (  # noqa: F401
    LONG_HTTP_REQUEST_TIMEOUT_SECONDS,
    SHORT_HTTP_REQUEST_TIMEOUT_SECONDS,
    SensorHttp,
)
from .utils.pose_util import (  # noqa: F401
    dewarp,
    euler_pose_to_matrix,
    interp_pose,
    interp_pose_float,
    quaternion_pose_to_matrix,
    transform,
)


def XYZLutFactory(info, use_extrinsics: bool = False):
    """Reference-compatible LUT constructor returning a callable that maps a
    scan or range image to (H, W, 3) points (ref: sdk/core/data.py:129
    XYZLut).

    Scans produced by the OSF device route carry a device-projected XYZ
    cache (dd-precision, <= 0.5 f32 ulp of this host f64 path, inside the
    SDK-wide 1e-5 m contract); when a SCAN is passed and its range
    content is unchanged since projection, the cache is served instead of
    re-projecting on the host. OUSTER_SDK_TPU_DEVICE_XYZ=0 disables
    serving (always recompute in f64)."""
    lut = make_xyz_lut(info, use_extrinsics)

    def project(scan_or_range):
        import os as _os

        import numpy as _np

        if hasattr(scan_or_range, "field"):
            rng = scan_or_range.field(ChanField.RANGE)
            if hasattr(scan_or_range, "cached_xyz") and \
                    _os.environ.get("OUSTER_SDK_TPU_DEVICE_XYZ") != "0":
                hit = scan_or_range.cached_xyz(0, use_extrinsics, rng)
                if hit is not None:
                    return hit.astype(_np.float64)
        else:
            rng = _np.asarray(scan_or_range)
        return lut(rng)

    return project


def XYZLutFloatFactory(info, use_extrinsics: bool = False):
    """Single-precision variant of XYZLutFactory
    (ref: sdk/core/data.py:176 XYZLutFloat)."""
    lut = make_xyz_lut_float(info, use_extrinsics)

    def project(scan_or_range):
        import numpy as _np

        if hasattr(scan_or_range, "field"):
            rng = scan_or_range.field(ChanField.RANGE)
        else:
            rng = _np.asarray(scan_or_range)
        return lut(rng)

    return project


# In the reference, ouster.sdk.core exports the data.py factory functions
# under the names XYZLut / XYZLutFloat (shadowing the C++ LUT classes);
# mirror that at our top level. The LUT dataclasses stay importable from
# ops.xyzlut.
XYZLut = XYZLutFactory
XYZLutFloat = XYZLutFloatFactory


# Deprecated aliases kept for reference parity
# (ref: core/__init__.py deprecated_alias block, deprecated since 0.16.0).
from ._deprecation import deprecated_alias, make_module_getattr  # noqa: F401,E402

deprecated_alias("version", "Version", Version, globals())
deprecated_alias("lidar_mode", "LidarMode", LidarMode, globals())
deprecated_alias("timestamp_mode", "TimestampMode", TimestampMode, globals())
deprecated_alias("sensor_config", "SensorConfig", SensorConfig, globals())
deprecated_alias("data_format", "DataFormat", DataFormat, globals())
deprecated_alias("product_info", "ProductInfo", ProductInfo, globals())
deprecated_alias("sensor_info", "SensorInfo", SensorInfo, globals())
deprecated_alias("packet_format", "PacketFormat", PacketFormat, globals())
deprecated_alias("SensorCalibration", "CalibrationStatus",
                 CalibrationStatus, globals())
deprecated_alias("invalid_version", "INVALID_VERSION",
                 INVALID_VERSION, globals())

__getattr__ = make_module_getattr(globals())
