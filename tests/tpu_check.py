"""On-hardware kernel validation, run as a clean subprocess (the pytest
suite forces the CPU platform process-globally, and only one process may
own the TPU).

Checks, all against the digest-proven numpy host decoder / f64 LUT:
  1. integer field decode (decode_frame, XLA) for EVERY udp profile —
     exact equality;
  2. fused LUT Pallas projection (unpack_project_pallas_batched) for
     single/dual/low-bandwidth profiles — <= 1 f32 ulp of f64, and
     <= 1e-5 m wherever f32 can represent it;
  3. LUT-free Pallas projection — same double-single contract.

Exit codes: 0 ok, 5 = no TPU available (caller skips).
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    try:
        os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    try:
        devs = jax.devices()
    except Exception as e:
        print(f"no jax backend: {e}", file=sys.stderr)
        return 5
    if devs[0].platform == "cpu":
        print("no TPU available", file=sys.stderr)
        return 5
    print(f"device: {devs[0].device_kind}", file=sys.stderr)

    import jax.numpy as jnp

    from ouster_sdk_tpu import ChanField, PacketFormat
    from ouster_sdk_tpu.core.types import UDPProfileLidar
    from ouster_sdk_tpu.ops.unpack import decode_frame, make_decode_plan
    from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut
    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut, unpack_project_pallas_batched)
    from ouster_sdk_tpu.ops.pallas_lutfree import (
        FactorTables, unpack_project_lutfree)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_all_profiles import ALL_PROFILES, _info

    from __graft_entry__ import _make_info, _synth_frame

    failures = []

    # ---- 1. integer decode, every profile -------------------------------
    from ouster_sdk_tpu import PacketWriter
    from ouster_sdk_tpu.ops.unpack import frame_words_from_packets

    for profile in ALL_PROFILES:
        info = _info(profile)
        pw = PacketWriter(info.format)
        pf = PacketFormat.from_info(info)
        plan = make_decode_plan(info)
        rng = np.random.default_rng(7)
        pkts = []
        for p in range(plan.n_pkts):
            buf = pw.new_packet()
            pw.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
            pw.set_frame_id(buf, 3)
            cpp = pw.columns_per_packet
            m0 = p * cpp
            pw.set_col_headers(
                buf, np.arange(cpp, dtype=np.uint64) + m0,
                np.arange(cpp, dtype=np.uint16) + m0,
                np.ones(cpp, dtype=np.uint32))
            for name in dict.fromkeys(pw.fields):
                mask = pf.field_value_mask(name)
                ne = pf.field_info(name).num_elements
                shape = (pw.pixels_per_column, cpp) + \
                    ((ne,) if ne > 1 else ())
                vals = rng.integers(0, 1 << 30, size=shape,
                                    dtype=np.uint64) & mask
                pw.set_field(buf, name, vals)
            pkts.append(np.frombuffer(buf.tobytes(), np.uint8))
        words = frame_words_from_packets(pkts, plan)
        out = jax.jit(lambda w: decode_frame(w, plan))(jnp.asarray(words))
        bufs = np.stack(pkts)
        w_cols = info.format.columns_per_frame
        for name in dict.fromkeys(pw.fields):
            if name not in out:  # plan decodes a subset for some profiles
                continue
            ref = pf.packet_field_all(name, bufs)  # (n, px, cols)
            ref = np.concatenate(list(ref), axis=1)[:, :w_cols]
            got = np.asarray(out[name])
            if got.shape != ref.shape or not (got == ref).all():
                failures.append(f"decode {profile.value}/{name}: mismatch")
        print(f"decode ok: {profile.value}", file=sys.stderr)

    # ---- 2. fused LUT projection ----------------------------------------
    def check_projection(w, h, dual, tag):
        info = _make_info(w=w, h=h, dual=dual)
        plan = make_decode_plan(info)
        frame = _synth_frame(info)
        lut64 = make_xyz_lut(info)
        lut = PlanarLut(lut64)
        out = jax.jit(lambda f: unpack_project_pallas_batched(
            f, lut.dir_hi, lut.dir_lo, lut.off_hi, lut.off_lo, plan,
            dual=dual))(jnp.asarray(frame[None]))
        xyz = np.moveaxis(np.asarray(out[0][0] if dual else out[0]), 0, -1)
        pf = PacketFormat.from_info(info)
        bufs = np.ascontiguousarray(frame).view(np.uint8)
        rng_img = pf.packet_field_all(ChanField.RANGE, bufs)
        rng_img = np.concatenate(list(rng_img), axis=1)[:, :w]
        ref = lut64(rng_img.astype(np.uint32))
        err = np.abs(xyz - ref)
        ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
        near = np.abs(ref) < 128.0
        if (err / np.maximum(ulp, 1e-30)).max() > 1.0 or \
                (near.any() and err[near].max() > 1e-5):
            failures.append(
                f"projection {tag}: max err {err.max()}, "
                f"ulp ratio {(err / np.maximum(ulp, 1e-30)).max()}")
        else:
            print(f"projection ok: {tag} (max err {err.max():.2e} m)",
                  file=sys.stderr)
        return info, plan, frame, ref, rng_img

    check_projection(1024, 128, False, "128x1024 single")
    info_d, plan_d, frame_d, ref_d, rng_d = check_projection(
        1024, 128, True, "128x1024 dual")

    # ---- 2b. planar-staged projection (the bench headline path) ---------
    from ouster_sdk_tpu.ops.pallas_kernels import \
        unpack_project_planar_batched

    info_p = _make_info(w=1024, h=128, dual=True)
    plan_p = make_decode_plan(info_p)
    frame_p = _synth_frame(info_p)
    # re-stage the packet words planar on the host (same layout the
    # native path produces)
    cols = frame_p[:, plan_p.hw:plan_p.hw + plan_p.cpp * plan_p.cw]
    cols = cols.reshape(plan_p.w, plan_p.cw)
    pix = cols[:, plan_p.chw:plan_p.chw + plan_p.h * plan_p.pw]
    planes = np.ascontiguousarray(
        pix.reshape(plan_p.w, plan_p.h, plan_p.pw).transpose(2, 1, 0))
    hdrs = np.ascontiguousarray(cols[:, :plan_p.chw].T)
    lut64p = make_xyz_lut(info_p)
    lutp = PlanarLut(lut64p)
    import jax.numpy as jnp2

    out = jax.jit(lambda p, h2: unpack_project_planar_batched(
        p, h2, lutp.stack,
        plan_p, dual=True))(jnp2.asarray(planes[None]),
                            jnp2.asarray(hdrs[None]))
    xyz_p = np.moveaxis(np.asarray(out[0][0]), 0, -1)
    pf_p = PacketFormat.from_info(info_p)
    rng_p = pf_p.packet_field_all(
        ChanField.RANGE, np.ascontiguousarray(frame_p).view(np.uint8))
    rng_p = np.concatenate(list(rng_p), axis=1)[:, :plan_p.w]
    ref_p = lut64p(rng_p.astype(np.uint32))
    err = np.abs(xyz_p - ref_p)
    ulp = np.spacing(np.abs(ref_p).astype(np.float32)).astype(np.float64)
    if (err / np.maximum(ulp, 1e-30)).max() > 1.0:
        failures.append(f"planar projection: max err {err.max()}")
    else:
        print(f"planar projection ok (max err {err.max():.2e} m)",
              file=sys.stderr)

    # ---- 2c. word-subset planar projection (minimal-transfer path) ------
    from ouster_sdk_tpu.ops.pallas_lutfree import _field_plan

    ws = (_field_plan(plan_p, "RANGE").word,
          _field_plan(plan_p, "RANGE2").word)
    planes_sub = np.ascontiguousarray(planes[None][:, list(ws)])
    out_s = jax.jit(lambda p, h2: unpack_project_planar_batched(
        p, h2, lutp.stack, plan_p, dual=True, words=ws))(
            jnp2.asarray(planes_sub), jnp2.asarray(hdrs[None]))
    if not (np.asarray(out_s[0]) == np.asarray(out[0])).all() or \
            not (np.asarray(out_s[1]) == np.asarray(out[1])).all():
        failures.append("word-subset planar projection != full-plane")
    else:
        print("word-subset planar projection ok (bit-identical)",
              file=sys.stderr)

    # ---- 2d. fused per-column dewarp (single-return) ---------------------
    info_s1 = _make_info(w=1024, h=128, dual=False)
    plan_s1 = make_decode_plan(info_s1)
    frame_s1 = _synth_frame(info_s1)
    cols1 = frame_s1[:, plan_s1.hw:plan_s1.hw + plan_s1.cpp * plan_s1.cw]
    cols1 = cols1.reshape(plan_s1.w, plan_s1.cw)
    pix1 = cols1[:, plan_s1.chw:plan_s1.chw + plan_s1.h * plan_s1.pw]
    planes1 = np.ascontiguousarray(
        pix1.reshape(plan_s1.w, plan_s1.h, plan_s1.pw).transpose(2, 1, 0))
    hdrs1 = np.ascontiguousarray(cols1[:, :plan_s1.chw].T)
    lut64s = make_xyz_lut(info_s1)
    luts1 = PlanarLut(lut64s)
    rng_gen = np.random.default_rng(7)
    from ouster_sdk_tpu.utils.pose_util import exp_pose6

    poses = np.stack([
        exp_pose6(np.concatenate([rng_gen.normal(0, 1, 3),
                                  rng_gen.normal(0, 0.1, 3)]))
        for _ in range(plan_s1.w)]).astype(np.float32)
    out_w = jax.jit(lambda p, h2, po: unpack_project_planar_batched(
        p, h2, luts1.stack, plan_s1, poses=po))(
            jnp2.asarray(planes1[None]), jnp2.asarray(hdrs1[None]),
            jnp2.asarray(poses[None]))
    xyz_w = np.moveaxis(np.asarray(out_w[0]), 0, -1)
    pf_s1 = PacketFormat.from_info(info_s1)
    rng_s1 = pf_s1.packet_field_all(
        ChanField.RANGE, np.ascontiguousarray(frame_s1).view(np.uint8))
    rng_s1 = np.concatenate(list(rng_s1), axis=1)[:, :plan_s1.w]
    sensor_xyz = lut64s(rng_s1.astype(np.uint32))
    world_ref = np.einsum("wij,hwj->hwi",
                          poses[:, :3, :3].astype(np.float64), sensor_xyz) \
        + poses[None, :, :3, 3]
    world_ref[rng_s1 == 0] = 0
    err_w = np.abs(xyz_w - world_ref)
    if err_w.max() > 2e-4:  # f32 pose matmul on ~1 m translations
        failures.append(f"fused dewarp: max err {err_w.max()}")
    else:
        print(f"fused dewarp ok (max err {err_w.max():.2e} m)",
              file=sys.stderr)

    # ---- 2d-dual. fused dewarp, dual-return (both kernel layouts ride
    # the 128x1024-dual planar staging from 2b; both returns share the
    # column's pose — ref: pose_util.h:44-67 is return-agnostic) --------
    poses_d = np.stack([
        exp_pose6(np.concatenate([rng_gen.normal(0, 1, 3),
                                  rng_gen.normal(0, 0.1, 3)]))
        for _ in range(plan_p.w)]).astype(np.float32)
    od1, od2 = jax.jit(lambda p, h2, po: unpack_project_planar_batched(
        p, h2, lutp.stack, plan_p, dual=True, poses=po))(
            jnp2.asarray(planes[None]), jnp2.asarray(hdrs[None]),
            jnp2.asarray(poses_d[None]))
    rng2_p = pf_p.packet_field_all(
        ChanField.RANGE2, np.ascontiguousarray(frame_p).view(np.uint8))
    rng2_p = np.concatenate(list(rng2_p), axis=1)[:, :plan_p.w]
    for out_k, r_img, tag in ((od1, rng_p, "ret1"), (od2, rng2_p, "ret2")):
        sens = lut64p(r_img.astype(np.uint32))
        wref = np.einsum("wij,hwj->hwi",
                         poses_d[:, :3, :3].astype(np.float64), sens) \
            + poses_d[None, :, :3, 3]
        wref[r_img == 0] = 0
        xyz_k = np.moveaxis(np.asarray(out_k[0]), 0, -1)
        errd = np.abs(xyz_k - wref)
        if errd.max() > 2e-4 or not (xyz_k[r_img == 0] == 0).all():
            failures.append(f"dual fused dewarp {tag}: "
                            f"max err {errd.max()}")
        else:
            print(f"dual fused dewarp ok [{tag}] "
                  f"(max err {errd.max():.2e} m)", file=sys.stderr)

    # ---- 2e. planar Pallas under a device mesh (ScanPipeline.sharded) ----
    # shard_map over the real chip(s): same kernel as 2b, batch-sharded.
    # CPU-mesh equality runs in tests/test_parallel.py; this proves the
    # Mosaic lowering composes with shard_map on hardware.
    from jax.sharding import Mesh
    from ouster_sdk_tpu.ops.fused import ScanPipeline
    from ouster_sdk_tpu.parallel import make_mesh

    pipe_sh = ScanPipeline(info_p)
    mesh_sh = make_mesh()          # every real device (1 in this sandbox)
    n_dev = mesh_sh.devices.size
    sp_sh = pipe_sh.sharded(mesh_sh, engine="pallas")
    planes_b = np.stack([planes] * n_dev)
    hdrs_b = np.stack([hdrs] * n_dev)
    o1, o2 = sp_sh.project(sp_sh.shard(planes_b), sp_sh.shard(hdrs_b))
    if not (np.asarray(o1[0]) == np.asarray(out[0][0])).all() or \
            not (np.asarray(o2[0]) == np.asarray(out[1][0])).all():
        failures.append("sharded planar Pallas != unsharded kernel")
    else:
        print(f"sharded planar Pallas ok on {n_dev}-device mesh "
              "(bit-identical to unsharded)", file=sys.stderr)

    # ---- 3. LUT-free projection -----------------------------------------
    tables = FactorTables(info_d)
    xyz = np.moveaxis(np.asarray(jax.jit(
        lambda f: unpack_project_lutfree(f, tables, plan_d))(
            jnp.asarray(frame_d))), 0, -1)
    err = np.abs(xyz - ref_d)
    # f32 budget scales with RANGE (in-kernel trig-free direction
    # synthesis; same bound as tests/test_lutfree.py)
    r_m = rng_d.astype(np.float64)[..., None] * 1e-3
    bound = np.maximum(3e-7 * np.maximum(r_m, 1.0) * 2, 2e-6)
    if not (err <= bound).all():
        failures.append(f"lutfree: max err {err.max()}")
    else:
        print(f"lutfree ok (max err {err.max():.2e} m)", file=sys.stderr)

    # ---- 3b. OSF device projection on hardware --------------------------
    # The OSF route's device half (host PNG decode -> fused dd projection
    # -> snapshot-guarded XYZ caches) running on the REAL chip against a
    # real reference capture (CPU-jax coverage: tests/test_device_osf.py).
    osf_fixture = ("/root/reference/tests/osfs/"
                   "OS-0-128_v3.0.1_1024x10_20241017_141645.osf")
    if os.path.exists(osf_fixture):
        from ouster_sdk_tpu import ChanField as _CF
        from ouster_sdk_tpu.io import device_engine as _de
        from ouster_sdk_tpu.io.osf import OsfScanSource

        before = _de.stats["osf_batches"]
        src = OsfScanSource(osf_fixture)
        lut64_osf = make_xyz_lut(src.sensor_info[0])
        n_osf, worst = 0, 0.0
        for ls_set in src:
            for s in ls_set:
                if s is None:
                    continue
                rng_osf = s.field(_CF.RANGE)
                hit = s.cached_xyz(0, False, rng_osf)
                if hit is None:
                    failures.append("OSF scan missing device XYZ cache")
                    continue
                ref_osf = lut64_osf(rng_osf)
                e = np.abs(hit.astype(np.float64) - ref_osf)
                u = np.spacing(np.abs(ref_osf).astype(np.float32)
                               ).astype(np.float64)
                if not (e <= np.maximum(u * 0.5 + 1e-30, 1e-7)).all():
                    failures.append(
                        f"OSF device projection: max err {e.max()}")
                worst = max(worst, float(e.max()))
                n_osf += 1
        if _de.stats["osf_batches"] <= before:
            failures.append("OSF route never dispatched to the device")
        elif n_osf:
            print(f"OSF device projection ok on hardware "
                  f"({n_osf} scans, max err {worst:.2e} m)",
                  file=sys.stderr)
    else:
        print("OSF fixture unavailable; section 3b skipped",
              file=sys.stderr)

    # ---- 4. device-resident ICP matches the host voxel-hash path -------
    from ouster_sdk_tpu.slam.jax_icp import (_MAP_CHUNK, _bucket,
                                             register_points_jax)
    from ouster_sdk_tpu.slam.kiss_icp import (VoxelHashMap,
                                              register_points_to_map,
                                              se3_exp)

    rng_state = np.random.RandomState(11)
    world = np.concatenate([
        np.c_[rng_state.uniform(-30, 30, 4000),
              rng_state.uniform(-30, 30, 4000), np.zeros(4000)],
        np.c_[rng_state.uniform(-30, 30, 2000), np.full(2000, 8.0),
              rng_state.uniform(0, 4, 2000)]])
    vm = VoxelHashMap(1.0, 200.0, 20)
    vm.add_points(world)
    T_true = se3_exp(np.array([0.25, 0.1, 0.05, 0.01, 0.0, 0.02]))
    scan_pts = (world[::2] - T_true[:3, 3]) @ T_true[:3, :3]
    host_T = register_points_to_map(scan_pts, vm, np.eye(4), 3.0, 0.6)
    mp = vm.pointcloud().astype(np.float32)
    N = _bucket(len(scan_pts))
    M = _bucket(max(len(mp), _MAP_CHUNK), _MAP_CHUNK)
    sp = np.zeros((N, 3), np.float32)
    sp[: len(scan_pts)] = scan_pts
    sv = np.zeros(N, bool)
    sv[: len(scan_pts)] = True
    mpad = np.zeros((M, 3), np.float32)
    mpad[: len(mp)] = mp
    mv = np.zeros(M, bool)
    mv[: len(mp)] = True
    dev_T = np.asarray(register_points_jax(
        jnp.asarray(sp), jnp.asarray(sv), jnp.asarray(mpad),
        jnp.asarray(mv), jnp.asarray(np.eye(4), jnp.float32),
        jnp.float32(3.0), jnp.float32(0.6), voxel_size=jnp.float32(1.0)))
    icp_err = np.linalg.norm(dev_T[:3, 3] - host_T[:3, 3])
    if icp_err > 1e-3:
        failures.append(f"device ICP vs host: {icp_err} m")
    else:
        print(f"device ICP ok (vs host {icp_err:.2e} m)", file=sys.stderr)

    if failures:
        print("FAILURES:\n" + "\n".join(failures), file=sys.stderr)
        return 1
    print("all TPU hardware checks passed", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
