"""Streaming paths: live frames -> device decode over loopback UDP,
AsyncWriter, multi-chunk OSF."""

import socket
import threading
import time

import numpy as np
import pytest

import jax.numpy as jnp

from ouster_sdk_tpu import ChanField


def test_live_frames_to_device_decode():
    """Loopback UDP -> SensorPacketSource -> FrameReader staging -> device
    decode: the full live TPU path without hardware."""
    from tests.test_sensor import _free_ports, _make_frame_packets, _test_info

    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.ops.unpack import decode_frame
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    src = SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                             lidar_port=lidar_port, imu_port=imu_port)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

        def send():
            for fid in (3, 4):
                for p in _make_frame_packets(info, frame_id=fid):
                    tx.sendto(p, ("127.0.0.1", lidar_port))
                    time.sleep(0.0002)

        t = threading.Thread(target=send)
        t.start()

        fr = FrameReader.__new__(FrameReader)
        fr.info = info
        from ouster_sdk_tpu import PacketFormat
        from ouster_sdk_tpu.ops.unpack import make_decode_plan

        fr.pf = PacketFormat.from_info(info)
        fr.plan = make_decode_plan(info)

        def bounded_packets():
            deadline = time.time() + 10
            n = 0
            while time.time() < deadline and n < 64:
                idx, p = src.get_packet(timeout_sec=0.5)
                if p is not None:
                    n += 1
                    yield idx, p

        frames = list(fr.stream_from_packets(bounded_packets()))
        t.join()
        assert frames, "no frames staged from live packets"
        fid, words, ts = frames[0]
        out = decode_frame(jnp.asarray(words), fr.plan)
        assert np.asarray(out[ChanField.RANGE]).any()
    finally:
        src.close()


def test_async_writer_and_chunking(tmp_path):
    from ouster_sdk_tpu.io.osf import AsyncWriter, Reader
    from ouster_sdk_tpu import LidarMode, LidarScan, SensorInfo

    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    rng = np.random.default_rng(0)
    path = str(tmp_path / "async.osf")
    # tiny chunk size to force multiple chunks
    with AsyncWriter(path, chunk_size=64 * 1024) as w:
        idx = w.add_sensor(info)
        for k in range(5):
            s = LidarScan(info)
            s.frame_id = k
            s.status[:] = 1
            s.timestamp[:] = np.arange(s.w, dtype=np.uint64) + k * 100000
            s.field(ChanField.RANGE)[:] = rng.integers(
                0, 1 << 19, size=(s.h, s.w))
            w.save(idx, s, ts=1000 + k)

    r = Reader(path)
    assert len(r.chunk_offsets) >= 2, "expected multiple chunks"
    scans = [m.decode() for m in r.messages() if m.is_lidar_scan()]
    assert [s.frame_id for s in scans] == [0, 1, 2, 3, 4]
    # messages come back in timestamp order across chunks
    ts = [m.ts for m in r.messages()]
    assert ts == sorted(ts)
