"""Live sensor backend tests over loopback UDP with synthesized packets —
the reference's no-hardware strategy (ref: SURVEY.md §4: PacketWriter-
synthesized streams + SensorInfo overrides so sources run without
hardware)."""

import socket
import time

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarMode, PacketWriter, SensorInfo
from ouster_sdk_tpu.core.types import UDPProfileLidar


from _live_helpers import (  # noqa: E402
    free_udp_ports as _free_ports,
    live_test_info as _test_info,
    synth_frame_packets as _make_frame_packets,
)


def test_sensor_packet_source_loopback():
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    src = SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                             lidar_port=lidar_port, imu_port=imu_port)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        pkts = _make_frame_packets(info, frame_id=5)
        for p in pkts[:4]:
            tx.sendto(p, ("127.0.0.1", lidar_port))
        got = []
        deadline = time.time() + 5
        while len(got) < 4 and time.time() < deadline:
            idx, pkt = src.get_packet(timeout_sec=0.5)
            if pkt is not None:
                got.append((idx, pkt))
        assert len(got) == 4
        assert all(i == 0 for i, _ in got)
        assert all(p.type().value == "Lidar" for _, p in got)
    finally:
        src.close()


def test_sensor_scan_source_loopback():
    from ouster_sdk_tpu.sensor.scan_source import SensorScanSource

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    src = SensorScanSource(["127.0.0.1"], sensor_info=[info],
                           lidar_port=lidar_port, imu_port=imu_port)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # two full frames; second frame completion flushes the first
        for fid in (7, 8):
            for p in _make_frame_packets(info, frame_id=fid):
                tx.sendto(p, ("127.0.0.1", lidar_port))
                time.sleep(0.0005)
        idx, scan = src.get_scan(timeout_sec=10.0)
        assert scan is not None, "no scan produced"
        assert idx == 0
        assert scan.frame_id in (7, 8)
        assert scan.complete()
        assert scan.field(ChanField.RANGE).any()
    finally:
        src.close()


def test_packet_id_validation_loopback():
    """Packets with a wrong serial are dropped unless soft_id_check."""
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    info.sn = 999111
    info.init_id = 1234
    src = SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                             lidar_port=lidar_port, imu_port=imu_port)
    try:
        pw = PacketWriter(info.format)
        buf = pw.new_packet()
        pw.set_packet_header(buf, init_id=4321, prod_sn=42)  # mismatched
        pw.set_frame_id(buf, 1)
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(buf.tobytes(), ("127.0.0.1", lidar_port))
        idx, pkt = src.get_packet(timeout_sec=1.0)
        assert pkt is None
        assert src.id_error_count == 1
    finally:
        src.close()


def test_emulator_serves_live_scan_source():
    """Full no-hardware live-path loop: SensorEmulator (HTTP control plane
    + paced UDP republish, ref: plugins/source_replay.py) serves packets to
    our own SensorScanSource, which batches complete scans."""
    from ouster_sdk_tpu.sensor.emulator import SensorEmulator
    from ouster_sdk_tpu.sensor.scan_source import SensorScanSource

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    frames = {fid: _make_frame_packets(info, fid) for fid in (1, 2, 3, 4)}

    def factory():
        t = 0
        for fid, pkts in frames.items():
            for i, p in enumerate(pkts):
                yield t + i * 10**6, "lidar", p
            t += 10**8  # 10 fps
    emu = SensorEmulator(info, factory, lidar_port=lidar_port,
                         imu_port=imu_port, http_port=0, rate=10.0,
                         loop=True)
    emu.start()
    try:
        src = SensorScanSource([f"127.0.0.1:{emu.http_port}"],
                               lidar_port=lidar_port, imu_port=imu_port,
                               timeout=10.0)
        try:
            deadline = time.monotonic() + 15.0
            got = None
            while time.monotonic() < deadline:
                idx, scan = src.get_scan(timeout_sec=1.0)
                if scan is not None and scan.complete():
                    got = scan
                    break
            assert got is not None, "no complete scan received via emulator"
            assert got.frame_id in frames
            # metadata round-tripped through the emulator's HTTP plane
            assert src.sensor_info[0].sn == info.sn
        finally:
            src.close()
    finally:
        emu.stop()


def test_emulator_http_surface():
    """The emulator answers the same /api/v1 endpoints our SensorHttp
    client consumes (metadata sections, config params, user data)."""
    from ouster_sdk_tpu.sensor.emulator import SensorEmulator
    from ouster_sdk_tpu.sensor.http import SensorHttp

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    emu = SensorEmulator(info, lambda: iter(()), lidar_port=lidar_port,
                         imu_port=imu_port, http_port=0)
    emu.start()
    try:
        http = SensorHttp.create(f"127.0.0.1:{emu.http_port}")
        from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata

        rt = sensor_info_from_metadata(http.metadata())
        assert rt.sn == info.sn
        assert rt.format.columns_per_frame == info.format.columns_per_frame
        cfg = http.active_config_params()
        assert cfg["udp_port_lidar"] == lidar_port
        bi = http.beam_intrinsics()
        assert "beam_azimuth_angles" in bi
        http.set_config_param("udp_dest", "1.2.3.4")
        assert http.staged_config_params()["udp_dest"] == "1.2.3.4"
        http.set_user_data("hello")
        assert http.get_user_data() == "hello"
    finally:
        emu.stop()


def test_sensor_http_version_dispatch():
    """SensorHttp.create probes image_rev and dispatches per firmware
    (ref: sensor_http.cpp:45-85): <2.4 rejected, 2.4/3.0 get a no-user-data
    impl, 3.1+ the full surface."""
    from ouster_sdk_tpu.sensor.emulator import SensorEmulator
    from ouster_sdk_tpu.sensor.http import (SensorHttp, SensorHttpError,
                                            SensorHttp_2_4_or_3)

    lidar_port, imu_port = _free_ports(2)

    def serve(image_rev):
        info = _test_info(lidar_port, imu_port)
        info.image_rev = image_rev
        # upgrade_firmware=False: serve the advertised fw verbatim so the
        # client's rejection paths can be exercised
        return SensorEmulator(info, lambda: iter(()),
                              lidar_port=lidar_port, imu_port=imu_port,
                              http_port=0, upgrade_firmware=False).start()

    emu = serve("ousteros-image-prod-aries-v3.2.0")
    try:
        h = SensorHttp.create(f"127.0.0.1:{emu.http_port}")
        assert type(h) is SensorHttp
        assert (h.version.major, h.version.minor) == (3, 2)
        h.set_user_data("x")  # full surface works
    finally:
        emu.stop()

    emu = serve("ousteros-image-prod-aries-v2.4.1")
    try:
        h = SensorHttp.create(f"127.0.0.1:{emu.http_port}")
        assert isinstance(h, SensorHttp_2_4_or_3)
        with pytest.raises(SensorHttpError, match="not supported"):
            h.get_user_data()
    finally:
        emu.stop()

    emu = serve("ousteros-image-prod-aries-v2.2.0")
    try:
        with pytest.raises(SensorHttpError, match="2.4 or later"):
            SensorHttp.create(f"127.0.0.1:{emu.http_port}")
    finally:
        emu.stop()


def test_emulator_to_planar_device_pipeline():
    """Full live TPU ingest: emulator UDP -> SensorPacketSource ->
    PlanarStreamAssembler -> planar kernel (interpret) == host reference."""
    from ouster_sdk_tpu.io.frames import PlanarStreamAssembler
    from ouster_sdk_tpu.sensor.emulator import SensorEmulator
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    frames = {fid: _make_frame_packets(info, fid) for fid in (1, 2, 3)}

    def factory():
        t = 0
        for fid, pkts in frames.items():
            for i, p in enumerate(pkts):
                yield t + i * 10**6, "lidar", p
            t += 10**8

    emu = SensorEmulator(info, factory, lidar_port=lidar_port,
                         imu_port=imu_port, http_port=0, rate=20.0,
                         loop=True)
    emu.start()
    released = []
    try:
        src = SensorPacketSource([f"127.0.0.1:{emu.http_port}"],
                                 lidar_port=lidar_port, imu_port=imu_port,
                                 sensor_info=[info])
        asm = PlanarStreamAssembler(info)
        pf0 = asm.pf
        n_pkts_expected = asm.plan.n_pkts
        pushed: dict = {}
        deadline = time.monotonic() + 15.0
        while time.monotonic() < deadline and len(released) < 2:
            idx, pkt = src.get_packet(timeout_sec=1.0)
            if pkt is None or pkt.type().value != "Lidar":
                continue
            fid_in = pf0.frame_id(np.frombuffer(bytes(pkt.buf), np.uint8))
            rel = asm.push(pkt)
            pushed[fid_in] = pushed.get(fid_in, 0) + 1
            # UDP is lossy even on loopback under load: only compare
            # frames for which every packet actually arrived
            if rel is not None and pushed.get(rel[0], 0) == n_pkts_expected:
                released.append((rel[0], rel[1].copy(), rel[2].copy()))
        src.close()
    finally:
        emu.stop()
    assert len(released) >= 1, "no complete planar frame over live path"

    # decode the released planar frame and compare RANGE with the packets
    import jax.numpy as jnp

    from ouster_sdk_tpu.ops.unpack import decode_frame_planar, \
        make_decode_plan
    from ouster_sdk_tpu import ChanField, PacketFormat

    plan = make_decode_plan(info)
    fid, planes, hdrs = released[0]
    out = decode_frame_planar(jnp.asarray(planes), jnp.asarray(hdrs), plan)
    pf = PacketFormat.from_info(info)
    bufs = np.stack([np.frombuffer(p, np.uint8)
                     for p in frames[((fid - 1) % 16) + 1]])
    ref = pf.packet_field_all(ChanField.RANGE, bufs)
    ref = np.concatenate(list(ref), axis=1)[:, :info.format.columns_per_frame]
    np.testing.assert_array_equal(np.asarray(out[ChanField.RANGE]), ref)


def test_scalar_reader_matches_word_path_all_profiles():
    """The byte-level scalar_reader (the live receive path's fast
    init_id/prod_sn/frame_id check) must agree with the word-staged
    read_bits accessors for every eUDP header layout, incl. FUSA's
    32-bit frame_id (ref: parsing.cpp:466-621)."""
    import numpy as np

    from ouster_sdk_tpu import (HeaderType, LidarMode, PacketWriter,
                                SensorInfo)
    from ouster_sdk_tpu.core.types import UDPProfileLidar
    from ouster_sdk_tpu.ops.packet_format import PacketFormat

    for profile, header in [
            (UDPProfileLidar.RNG19_RFL8_SIG16_NIR16, HeaderType.STANDARD),
            (UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_DUAL,
             HeaderType.STANDARD),
            (UDPProfileLidar.FUSA_RNG15_RFL8_NIR8_DUAL, HeaderType.FUSA),
            (UDPProfileLidar.RNG15_RFL8_NIR8, HeaderType.STANDARD)]:
        info = SensorInfo.from_default(LidarMode.from_string("512x10"))
        info.format.udp_profile_lidar = profile
        info.format.header_type = header
        info.init_id = 0x123456
        info.sn = 99224400817
        pw = PacketWriter(info.format)
        buf = pw.new_packet()
        pw.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
        fid = 0xABCDEF01 if header == HeaderType.FUSA else 0xBEEF
        pw.set_frame_id(buf, fid)
        pf = PacketFormat.from_info(info)
        raw = buf.tobytes()
        for fi_name, expect in (("init_id", info.init_id),
                                ("prod_sn", info.sn),
                                ("frame_id", fid)):
            fi = getattr(pf.geom, fi_name)
            fast = pf.scalar_reader(fi)
            word = getattr(pf, fi_name)(buf)
            assert fast(raw) == word == expect, (profile, fi_name)
            # ndarray input too (the recvmmsg workspace path)
            assert fast(np.frombuffer(raw, np.uint8)) == expect
