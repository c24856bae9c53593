"""Sensor emulator: serve a recorded/synthesized stream as a live sensor.

Rebuild of the reference replay server (ref: python/src/ouster/cli/plugins/
source_replay.py — flask HTTP control plane + paced UDP republish with
loop/rate). Pure stdlib: ThreadingHTTPServer for the /api/v1 surface our
own SensorHttp client consumes, a sender thread pacing UDP packets by
their timestamps. Doubles as the no-hardware test rig for the live sensor
backend (tests/test_sensor.py loopback, HIL-free).
"""

from __future__ import annotations

import json
import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Iterable, Optional, Tuple
from urllib.parse import urlparse

from ..core.types import SensorInfo

# (ts_ns, kind, payload) with kind in {"lidar", "imu", "zone"}
PacketItem = Tuple[int, str, bytes]


class SensorEmulator:
    """Serve packets as a fake sensor on loopback/LAN.

    packets_factory is called once per playback pass (so loop=True can
    restart the stream) and must return an iterable of (ts_ns, kind,
    payload_bytes).
    """

    def __init__(self, info: SensorInfo,
                 packets_factory: Callable[[], Iterable[PacketItem]], *,
                 udp_dest: str = "127.0.0.1",
                 lidar_port: Optional[int] = None,
                 imu_port: Optional[int] = None,
                 http_port: int = 0,
                 http_addr: str = "127.0.0.1",
                 rate: float = 1.0,
                 loop: bool = False,
                 upgrade_firmware: bool = True,
                 mdns: bool = False,
                 mdns_port: int = 5353):
        self.info = info
        self._factory = packets_factory
        self._udp_dest = udp_dest
        self.lidar_port = lidar_port if lidar_port is not None else \
            (info.config.udp_port_lidar or 7502)
        self.imu_port = imu_port if imu_port is not None else \
            (info.config.udp_port_imu or 7503)
        self._rate = rate
        self._loop = loop
        self._stop = threading.Event()
        self._upgrade_firmware = upgrade_firmware
        self._staged_config = {}
        self.packets_sent = 0
        self.passes_completed = 0

        self._http = ThreadingHTTPServer((http_addr, http_port),
                                         self._make_handler())
        self.http_port = self._http.server_address[1]
        self._http_thread = threading.Thread(
            target=self._http.serve_forever, daemon=True)
        self._send_thread = threading.Thread(target=self._send_loop,
                                             daemon=True)
        # optional DNS-SD advertisement, like a real sensor's mDNS
        # announcer (ref: plugins/discover.py service names); answers
        # PTR queries with SRV pointing at the emulator's HTTP port
        self._mdns = None
        if mdns:
            from .mdns import MDNSResponder

            self._mdns = MDNSResponder(
                f"os-{info.sn or 122246000000}", port=self.http_port,
                address=http_addr, bind_port=mdns_port,
                txt={"pn": info.prod_line or "OS-1-128",
                     "sn": str(info.sn or "")})
        self.mdns_port = self._mdns.bound_port if self._mdns else None

    # -- control plane ------------------------------------------------------
    def _make_handler(self):
        meta = json.loads(self.info.to_json_string())
        # advertise the emulator's actual ports
        meta.setdefault("config_params", {})
        meta["config_params"]["udp_port_lidar"] = self.lidar_port
        meta["config_params"]["udp_port_imu"] = self.imu_port
        # SensorHttp.create() probes image_rev and rejects fw < 2.4; the
        # emulator only implements the modern /api/v1 surface, so a missing
        # or pre-2.4 image_rev (common in old recordings) is upgraded to a
        # firmware the served API actually matches
        from ..core.types import Version

        si = meta.setdefault("sensor_info", {})
        fw = Version.from_string(str(si.get("image_rev", "")))
        if self._upgrade_firmware and (
                fw.major < 2 or (fw.major == 2 and fw.minor <= 3)):
            si["image_rev"] = "ousteros-image-prod-aries-v3.2.0"
        emu = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _bytes(self, data: bytes, code=200,
                       ctype="application/zip"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                u = urlparse(self.path)
                p = u.path.rstrip("/")
                if p == "/api/v1/sensor/metadata":
                    return self._json(meta)
                if p.startswith("/api/v1/sensor/metadata/"):
                    key = p.rsplit("/", 1)[1]
                    if key in meta:
                        return self._json(meta[key])
                    return self._json({"error": "unknown section"}, 404)
                if p == "/api/v1/sensor/cmd/get_config_param":
                    which = (u.query.split("=", 1) + [""])[1]
                    cfg = dict(meta.get("config_params", {}))
                    if which == "staged":
                        cfg.update(emu._staged_config)
                    return self._json(cfg)
                if p == "/api/v1/system/firmware":
                    return self._json(
                        {"fw": meta.get("sensor_info", {}).get(
                            "build_rev", "ousteros-image-prod-aries-"
                            "v2.0.0")})
                if p == "/api/v1/system/network":
                    return self._json({"ipv4": {"override": None}})
                if p == "/api/v1/user/data":
                    return self._json(getattr(emu, "_user_data", ""))
                # zone monitor surface (ref: sensor_http_imp.cpp:273-341)
                if p == "/api/v1/zone_monitor/active/zip":
                    return self._bytes(getattr(emu, "_zm_active", b""))
                if p == "/api/v1/zone_monitor/staged/zip":
                    return self._bytes(getattr(emu, "_zm_staged", b""))
                if p == "/api/v1/zone_monitor/live_ids":
                    return self._json(getattr(emu, "_zm_live_ids", []))
                return self._json({"error": "not found"}, 404)

            def do_POST(self):
                u = urlparse(self.path)
                p = u.path.rstrip("/")
                if p == "/api/v1/sensor/cmd/set_config_param":
                    from urllib.parse import unquote

                    args = u.query.split("=", 1)
                    if len(args) == 2 and "+" in args[1]:
                        k, v = args[1].split("+", 1)
                        k, v = unquote(k), unquote(v)
                        try:
                            v = json.loads(v)
                        except ValueError:
                            pass
                        if k == "udp_dest" and v == "@auto":
                            # like the fw: resolve '@auto' to the
                            # requester's address (ref:
                            # sensor_http_imp.cpp auto udp_dest flow)
                            v = self.client_address[0]
                        emu._staged_config[k] = v
                    return self._json("set_config_param")
                if p in ("/api/v1/sensor/cmd/set_udp_dest_auto",
                         "/api/v1/sensor/cmd/reinitialize",
                         "/api/v1/sensor/cmd/save_config_params",
                         "/api/v1/system/restart"):
                    return self._json("ok")
                if p == "/api/v1/user/data":
                    ln = int(self.headers.get("Content-Length", 0))
                    emu._user_data = json.loads(
                        self.rfile.read(ln).decode() or '""')
                    return self._json("ok")
                # zone monitor: stage zip (applied automatically, like the
                # current fw; ref: sensor_http_imp.cpp:294-299), apply,
                # set live ids
                if p == "/api/v1/zone_monitor/staged/zip":
                    ln = int(self.headers.get("Content-Length", 0))
                    emu._zm_staged = self.rfile.read(ln)
                    emu._zm_active = emu._zm_staged
                    return self._json("ok")
                if p == "/api/v1/zone_monitor/apply":
                    self.rfile.read(
                        int(self.headers.get("Content-Length", 0)))
                    emu._zm_active = getattr(emu, "_zm_staged", b"")
                    return self._json("ok")
                if p == "/api/v1/zone_monitor/live_ids":
                    ln = int(self.headers.get("Content-Length", 0))
                    emu._zm_live_ids = json.loads(
                        self.rfile.read(ln).decode() or "[]")
                    return self._json("ok")
                return self._json({"error": "not found"}, 404)

            do_PUT = do_POST

            def do_DELETE(self):
                p = urlparse(self.path).path.rstrip("/")
                if p == "/api/v1/user/data":
                    emu._user_data = ""
                    return self._json("ok")
                if p == "/api/v1/zone_monitor/staged":
                    emu._zm_staged = b""
                    return self._json("ok")
                return self._json({"error": "not found"}, 404)

        return Handler

    # -- data plane ----------------------------------------------------------
    def _send_loop(self):
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        ports = {"lidar": self.lidar_port, "imu": self.imu_port,
                 "zone": self.info.config.udp_port_zm or 7504}
        while not self._stop.is_set():
            t0_pkt = None
            t0_wall = time.monotonic()
            for ts, kind, payload in self._factory():
                if self._stop.is_set():
                    return
                if self._rate > 0:
                    if t0_pkt is None:
                        t0_pkt = ts
                    target = t0_wall + (ts - t0_pkt) * 1e-9 / self._rate
                    # sleep in <=1 s slices, re-checking the target and
                    # stop flag, so capture gaps longer than 1 s are
                    # honored instead of compressed
                    while not self._stop.is_set():
                        delay = target - time.monotonic()
                        if delay <= 0:
                            break
                        time.sleep(min(delay, 1.0))
                    if self._stop.is_set():
                        return
                sock.sendto(payload, (self._udp_dest, ports[kind]))
                self.packets_sent += 1
            self.passes_completed += 1
            if not self._loop:
                break

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "SensorEmulator":
        self._http_thread.start()
        self._send_thread.start()
        if self._mdns is not None:
            self._mdns.start()
        return self

    def join(self, timeout: Optional[float] = None) -> None:
        """Wait for playback to finish (non-loop mode)."""
        self._send_thread.join(timeout)

    def stop(self) -> None:
        self._stop.set()
        if self._mdns is not None:
            self._mdns.stop()
        self._http.shutdown()
        self._http.server_close()

    def __enter__(self) -> "SensorEmulator":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def packets_from_scans(scan_sets: Iterable, info: SensorInfo,
                       sensor_idx: int = 0,
                       frame_period_ns: Optional[int] = None,
                       frame_id_offset: int = 0
                       ) -> Iterable[PacketItem]:
    """Re-packetize a scan stream for the emulator (one sensor).

    frame_id_offset shifts every frame id — looped playback must rotate
    ids each pass or the consumer's batcher (correctly) drops the repeats
    as duplicates."""
    from ..io.save import scan_to_packets
    from ..ops.packet_format import PacketWriter

    fps = getattr(info.format, "fps", 0) or 10
    period = frame_period_ns or int(1e9 / fps)
    pw = PacketWriter(info.format) if frame_id_offset else None
    t = 0
    for ls_set in scan_sets:
        scan = ls_set[sensor_idx] if sensor_idx < len(ls_set) else None
        if scan is None:
            continue
        base = int(scan.first_valid_packet_timestamp()
                   or scan.first_valid_column_timestamp() or t)
        pkts = scan_to_packets(scan, info)
        for i, pkt in enumerate(pkts):
            if pw is not None:
                fid = (max(scan.frame_id, 0) + frame_id_offset) & 0xFFFF
                pw.set_frame_id(pkt, fid)
            yield base + i * period // max(len(pkts), 1), "lidar", \
                pkt.tobytes()
        t = base + period


def looping_packets_factory(scan_sets, info: SensorInfo,
                            sensor_idx: int = 0, id_stride: int = 16):
    """Factory for SensorEmulator(loop=True): each playback pass shifts
    frame ids by id_stride so downstream batchers see fresh frames."""
    sets = list(scan_sets)
    state = {"pass": 0}

    def factory():
        off = state["pass"] * id_stride
        state["pass"] += 1
        return packets_from_scans(sets, info, sensor_idx,
                                  frame_id_offset=off)

    return factory
