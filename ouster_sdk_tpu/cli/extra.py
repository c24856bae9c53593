"""Additional CLI commands: osf file ops, sensor config/userdata, replay,
mask (ref: plugins/source.py mask/config/userdata, plugins/source_replay.py,
CLI osf subcommands)."""

from __future__ import annotations

import json
import sys
import time

import click
import numpy as np

from .core import cli, source


@source.command("mask")
@click.argument("mask_path")
@click.pass_context
def source_mask(ctx, mask_path):
    """Zero pixels where a mask image (PNG, nonzero=keep) is zero
    (ref: plugins/source.py mask)."""
    from ..io.derived import mask_scan
    from ..utils import png as P

    img, _, _ = P.decode(open(mask_path, "rb").read())
    if img.ndim == 3:
        img = img[..., 0]
    mask = img > 0

    def stage(it):
        for ls_set in it:
            for s in ls_set.valid():
                m = mask
                if m.shape != (s.h, s.w):
                    ys = np.linspace(0, m.shape[0] - 1, s.h).astype(int)
                    xs = np.linspace(0, m.shape[1] - 1, s.w).astype(int)
                    m = m[ys][:, xs]
                mask_scan(s, m)
            yield ls_set

    ctx.obj.add_stage(stage)


@source.command("replay")
@click.option("--rate", type=float, default=1.0,
              help="playback rate multiple (0 = as fast as possible)")
@click.pass_context
def source_replay(ctx, rate):
    """Pace the stream at sensor rate (ref: plugins/source_replay.py)."""
    def stage(it):
        last_ts = None
        last_wall = None
        for ls_set in it:
            ts = ls_set.combined_timestamp()
            if rate > 0 and last_ts is not None and ts > last_ts:
                dt = (ts - last_ts) * 1e-9 / rate
                elapsed = time.monotonic() - last_wall
                if dt > elapsed:
                    time.sleep(dt - elapsed)
            last_ts, last_wall = ts, time.monotonic()
            yield ls_set

    ctx.obj.add_stage(stage)


@source.command("normals")
@click.pass_context
def source_normals(ctx):
    """Compute NORMALS fields for each scan (ref: processing.cpp normals)."""
    from ..ops.normals import scan_normals

    def stage(it):
        for ls_set in it:
            for s in ls_set.valid():
                scan_normals(s)
            yield ls_set

    ctx.obj.add_stage(stage)


@source.command("convert")
@click.argument("path")
@click.pass_context
def source_convert(ctx, path):
    """Convert the source to another container (alias of save;
    ref: plugins/source_mapping.py convert)."""
    from ..io.save import save_scans

    pipeline = ctx.obj

    def consumer(it):
        n = save_scans(path, pipeline.infos, it)
        click.echo(f"converted {n} scans to {path}")

    pipeline.consumers.append(consumer)


@cli.group()
def osf() -> None:
    """OSF file operations."""


@osf.command("info")
@click.argument("path")
def osf_info_cmd(path):
    from ..io.osf_ops import osf_info

    click.echo(json.dumps(osf_info(path), indent=2))


@osf.command("slice")
@click.argument("src")
@click.argument("dst")
@click.option("--start-index", type=int, default=None)
@click.option("--end-index", type=int, default=None)
def osf_slice_cmd(src, dst, start_index, end_index):
    from ..io.osf_ops import osf_slice

    n = osf_slice(src, dst, start_index=start_index, end_index=end_index)
    click.echo(f"wrote {n} scans to {dst}")


@osf.command("metadata")
@click.argument("path")
def osf_metadata_cmd(path):
    from ..io.osf_ops import osf_get_sensor_metadata

    for m in osf_get_sensor_metadata(path):
        click.echo(m)


@cli.group()
def sensor() -> None:
    """Live sensor control-plane commands."""


@sensor.command("config")
@click.argument("hostname")
@click.argument("keyval", nargs=-1)
@click.option("--persist", is_flag=True, default=False)
def sensor_config(hostname, keyval, persist):
    """Get or set sensor configuration (ref: plugins/source_sensor.py)."""
    from ..sensor.http import SensorHttp

    http_client = SensorHttp.create(hostname)
    if not keyval:
        click.echo(json.dumps(http_client.active_config_params(), indent=2))
        return
    for kv in keyval:
        if "=" not in kv:
            raise click.UsageError(f"expected key=value, got {kv!r}")
        k, v = kv.split("=", 1)
        http_client.set_config_param(k, v)
    http_client.reinitialize()
    if persist:
        http_client.save_config_params()
    click.echo("config applied")


@sensor.command("userdata")
@click.argument("hostname")
@click.option("--set", "set_value", default=None)
@click.option("--delete", is_flag=True, default=False)
def sensor_userdata(hostname, set_value, delete):
    from ..sensor.http import SensorHttp

    http_client = SensorHttp.create(hostname)
    if delete:
        http_client.delete_user_data()
        click.echo("deleted")
    elif set_value is not None:
        http_client.set_user_data(set_value)
        click.echo("set")
    else:
        click.echo(http_client.get_user_data())


@sensor.command("metadata")
@click.argument("hostname")
def sensor_metadata(hostname):
    from ..sensor.http import SensorHttp

    click.echo(SensorHttp.create(hostname).metadata())


def _register_benchmark_sensor():
    from .core import cli as _cli

    util_grp = _cli.commands.get("util")
    if util_grp is None:
        return

    @util_grp.command("benchmark-sensor")
    @click.argument("hostname")
    @click.option("--frames", type=int, default=30)
    @click.option("--scan-batch/--no-scan-batch", default=True)
    @click.option("--xyz/--no-xyz", default=True)
    def benchmark_sensor(hostname, frames, scan_batch, xyz):
        """Live pipeline stage timing (ref: cli/core/util.py:368
        benchmark-sensor)."""
        import time as _time

        import numpy as _np

        from ..ops.xyzlut import make_xyz_lut
        from ..sensor.scan_source import SensorScanSource

        src = SensorScanSource([hostname])
        info = src.sensor_info[0]
        lut = make_xyz_lut(info) if xyz else None
        t_recv = t_xyz = 0.0
        n = 0
        t0 = _time.perf_counter()
        try:
            for idx, scan in iter(lambda: src.get_scan(timeout_sec=5.0),
                                  (None, None)):
                if scan is None:
                    break
                t_recv += _time.perf_counter() - t0
                if lut is not None:
                    t1 = _time.perf_counter()
                    from ..core.constants import ChanField

                    lut(scan.field(ChanField.RANGE))
                    t_xyz += _time.perf_counter() - t1
                n += 1
                if n >= frames:
                    break
                t0 = _time.perf_counter()
        finally:
            src.close()
        click.echo(json.dumps({
            "frames": n,
            "recv_ms_per_frame": round(t_recv / max(n, 1) * 1e3, 3),
            "xyz_ms_per_frame": round(t_xyz / max(n, 1) * 1e3, 3),
        }, indent=2))


_register_benchmark_sensor()
del _register_benchmark_sensor
