"""Independent verification of the PoseOptimizer's re-derived constraint
math (VERDICT r4 item 5).

Four prongs:
 1. Literal numpy transcriptions of the reference's four Ceres autodiff
    functors (ref: ouster_mapping/src/{pose_to_pose,absolute_pose,
    point_to_point,absolute_point}_constraint_impl.cpp) evaluated at
    random states must agree with our `_residuals` blocks. Our residuals
    use the inverse/rotated-frame variant of the same error (rotvec of
    T_err^-1, translation expressed in the constraint frame), so the
    agreement contract is exact NORM equality per rot/trans sub-block —
    which is exact COST equality for the isotropic weights our API
    exposes.
 2. Finite-difference jacobians at random states: every nonzero of the
    true jacobian must lie inside the declared sparsity pattern (a
    pattern miss silently corrupts scipy's sparse 2-point jacobian).
 3. A synthetic pose graph with a KNOWN analytic optimum (constraints
    generated exactly from a ground-truth trajectory, nodes perturbed):
    the solver must reach the ground truth, not merely reduce the loss.
 4. The Ceres->scipy robust-loss mapping must be an exact curve match
    (HuberLoss/CauchyLoss/SoftLOneLoss at f_scale=a, ArctanLoss at
    f_scale=sqrt(a); ref: pose_optimizer.cpp create_loss_function).
"""

import numpy as np
import pytest

from ouster_sdk_tpu.slam.pose_optimizer import (
    AbsolutePointConstraint,
    AbsolutePoseConstraint,
    Node,
    PointToPointConstraint,
    PoseOptimizer,
    PoseToPoseConstraint,
    SolverConfig,
    _params_to_T,
    _T_to_params,
)

# ---------------------------------------------------------------------------
# quaternion helpers (w, x, y, z) for the functor transcriptions
# ---------------------------------------------------------------------------


def _q_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _q_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def _q_rot(q, v):
    qv = np.concatenate([[0.0], v])
    return _q_mul(_q_mul(q, qv), _q_conj(q))[1:]


def _q_from_R(R):
    from ouster_sdk_tpu.utils.extrinsics import rotation_matrix_to_quaternion

    return np.array(rotation_matrix_to_quaternion(R))


def _rand_pose(rng):
    w = rng.normal(0, 0.8, 3)
    from ouster_sdk_tpu.slam.pose_optimizer import _rotvec_to_R

    T = np.eye(4)
    T[:3, :3] = _rotvec_to_R(w)
    T[:3, 3] = rng.normal(0, 5.0, 3)
    return T


# ---------------------------------------------------------------------------
# literal transcriptions of the reference functors
# ---------------------------------------------------------------------------


def _ref_quat_to_angle_axis(q):
    """rotation_quaternion_to_angle_axis
    (ref: pose_to_pose_constraint_impl.cpp:23-39) verbatim: normalize,
    flip to w>=0, scale = angle/sin(angle/2) (2 below cutoff)."""
    q = q / np.linalg.norm(q)
    if q[0] < 0.0:
        q = -q
    angle = 2.0 * np.arctan2(np.linalg.norm(q[1:]), q[0])
    scale = 2.0 if angle < 1e-7 else angle / np.sin(angle / 2.0)
    return scale * q[1:]


def _ref_pose_to_pose(q_i, t_i, q_j, t_j, diff_q, diff_t, rw, tw):
    """(ref: pose_to_pose_constraint_impl.cpp compute_unscaled_error):
    rot = aa(q_j^-1 q_i diff), trans = diff_t - q_i^-1 (t_j - t_i)."""
    h_translation = _q_rot(_q_conj(q_i), t_j - t_i)
    h_rotation_inverse = _q_mul(_q_conj(q_j), q_i)
    aa = _ref_quat_to_angle_axis(_q_mul(h_rotation_inverse, diff_q))
    return np.concatenate([aa * rw, (diff_t - h_translation) * tw])


def _ref_absolute_pose(q_cur, t_cur, q_tgt, t_tgt, rw, tw):
    """(ref: absolute_pose_constraint_impl.cpp operator(), diff=identity):
    rot = aa(q_cur^-1 q_tgt), trans = t_cur - t_tgt."""
    err_q = _q_mul(_q_conj(q_cur), q_tgt)
    # Eigen::AngleAxis(quaternion): standard shortest-angle conversion
    aa = _ref_quat_to_angle_axis(err_q)
    return np.concatenate([aa * rw, (t_cur - t_tgt) * tw])


def _ref_point_to_point(q_i, t_i, q_j, t_j, pt_i, pt_j, tw):
    """(ref: point_to_point_constraint_impl.cpp): (T_j pt_j - T_i pt_i)."""
    return (_q_rot(q_j, pt_j) + t_j - (_q_rot(q_i, pt_i) + t_i)) * tw


def _ref_absolute_point(q, t, local_pt, target, tw):
    """(ref: absolute_point_constraint_impl.cpp): (T pt - target)."""
    return (_q_rot(q, local_pt) + t - target) * tw


# ---------------------------------------------------------------------------


def _block_residuals(opt, x):
    """Our residual vector split back into per-constraint blocks."""
    r = opt._residuals(x)
    blocks = []
    pos = 0
    for c in opt.constraints:
        n = 6 if isinstance(c, (AbsolutePoseConstraint,
                                PoseToPoseConstraint)) else 3
        blocks.append(r[pos:pos + n])
        pos += n
    return blocks


def test_residuals_match_reference_functors():
    rng = np.random.default_rng(3)
    for trial in range(20):
        T1, T2 = _rand_pose(rng), _rand_pose(rng)
        rel = np.linalg.solve(_rand_pose(rng), _rand_pose(rng))
        target = _rand_pose(rng)
        p1, p2 = rng.normal(0, 3, 3), rng.normal(0, 3, 3)
        tgt_pt = rng.normal(0, 3, 3)
        rw, tw = 1.7, 0.6

        nodes = [Node(0, T1.copy()), Node(1000, T2.copy())]
        opt = PoseOptimizer(nodes, SolverConfig(process_printout=False))
        opt.add_constraint(PoseToPoseConstraint(
            0, 1000, rel, rotation_weight=rw, translation_weight=tw))
        opt.add_constraint(AbsolutePoseConstraint(
            0, target, rotation_weight=rw, translation_weight=tw))
        opt.add_constraint(PointToPointConstraint(
            0, p1, 1000, p2, translation_weight=tw))
        opt.add_constraint(AbsolutePointConstraint(
            1000, p2, tgt_pt, translation_weight=tw))

        x = np.concatenate([_T_to_params(T1), _T_to_params(T2)])
        ours = _block_residuals(opt, x)

        q1, t1 = _q_from_R(T1[:3, :3]), T1[:3, 3]
        q2, t2 = _q_from_R(T2[:3, :3]), T2[:3, 3]
        ref_p2p = _ref_pose_to_pose(
            q1, t1, q2, t2, _q_from_R(rel[:3, :3]), rel[:3, 3], rw, tw)
        ref_abs = _ref_absolute_pose(
            q1, t1, _q_from_R(target[:3, :3]), target[:3, 3], rw, tw)
        ref_ptp = _ref_point_to_point(q1, t1, q2, t2, p1, p2, tw)
        ref_abp = _ref_absolute_point(q2, t2, p2, tgt_pt, tw)

        # pose constraints: exact rot-norm and trans-norm agreement (our
        # residual is the inverse/rotated-frame variant — same cost)
        for ref, got in ((ref_p2p, ours[0]), (ref_abs, ours[1])):
            assert np.isclose(np.linalg.norm(ref[:3]),
                              np.linalg.norm(got[:3]), rtol=1e-9), trial
            assert np.isclose(np.linalg.norm(ref[3:]),
                              np.linalg.norm(got[3:]), rtol=1e-9), trial
        # point constraints: exact vector agreement up to overall sign
        assert np.allclose(np.abs(ref_ptp), np.abs(ours[2]), rtol=1e-9)
        np.testing.assert_allclose(ref_abp, ours[3], rtol=1e-9)


def test_fd_jacobian_within_declared_sparsity():
    """Every finite-difference jacobian nonzero must be inside
    _jac_sparsity's pattern — scipy's sparse 2-point jacobian silently
    zeroes anything outside it."""
    rng = np.random.default_rng(4)
    nodes = [Node(i * 1000, _rand_pose(rng)) for i in range(5)]
    opt = PoseOptimizer(nodes, SolverConfig(process_printout=False))
    for a, b in zip(nodes[:-1], nodes[1:]):
        opt.add_constraint(PoseToPoseConstraint(
            a.ts, b.ts, np.linalg.solve(a.pose, b.pose)))
    opt.add_constraint(AbsolutePoseConstraint(0, _rand_pose(rng)))
    opt.add_constraint(PointToPointConstraint(
        1000, rng.normal(0, 2, 3), 3000, rng.normal(0, 2, 3)))
    opt.add_constraint(AbsolutePointConstraint(
        4000, rng.normal(0, 2, 3), rng.normal(0, 2, 3)))

    x0 = np.concatenate([_T_to_params(n.pose) for n in opt.nodes])
    r0 = opt._residuals(x0)
    eps = 1e-7
    J = np.zeros((r0.size, x0.size))
    for k in range(x0.size):
        xp = x0.copy()
        xp[k] += eps
        J[:, k] = (opt._residuals(xp) - r0) / eps
    S = opt._jac_sparsity().toarray()
    outside = np.abs(J[S == 0])
    assert outside.size and outside.max() < 1e-6, outside.max()
    # and the pattern is not vacuous: real structure inside
    assert np.abs(J[S == 1]).max() > 0.1


def test_solver_reaches_known_analytic_optimum():
    """Constraints generated exactly from a ground-truth trajectory have
    a zero-residual optimum AT the ground truth; anchored at both ends
    the solution is unique, so the solver must recover GT poses — not
    just shrink the loss."""
    rng = np.random.default_rng(5)
    n = 6
    gt = [np.eye(4)]
    for _ in range(n - 1):
        step = np.eye(4)
        from ouster_sdk_tpu.slam.pose_optimizer import _rotvec_to_R

        step[:3, :3] = _rotvec_to_R(rng.normal(0, 0.1, 3))
        step[:3, 3] = rng.normal([1.0, 0, 0], 0.2)
        gt.append(gt[-1] @ step)

    # perturbed initial nodes
    nodes = []
    for i, T in enumerate(gt):
        P = T.copy()
        from ouster_sdk_tpu.slam.pose_optimizer import _rotvec_to_R

        P[:3, :3] = _rotvec_to_R(rng.normal(0, 0.03, 3)) @ P[:3, :3]
        P[:3, 3] += rng.normal(0, 0.3, 3)
        nodes.append(Node(i * 10 ** 9, P))

    opt = PoseOptimizer(nodes, SolverConfig(
        loss="TRIVIAL_LOSS", process_printout=False))
    for i in range(n - 1):
        opt.add_constraint(PoseToPoseConstraint(
            nodes[i].ts, nodes[i + 1].ts,
            np.linalg.solve(gt[i], gt[i + 1])))
    opt.add_constraint(AbsolutePoseConstraint(nodes[0].ts, gt[0]))
    opt.add_constraint(AbsolutePoseConstraint(nodes[-1].ts, gt[-1]))
    # two point constraints, exactly consistent with GT
    world_pt = np.array([3.0, -1.0, 2.0])
    for i in (1, 3):
        local = np.linalg.solve(gt[i], np.append(world_pt, 1.0))[:3]
        opt.add_constraint(AbsolutePointConstraint(
            nodes[i].ts, local, world_pt))

    solved = opt.solve()
    for i, nd in enumerate(solved):
        t_err = np.linalg.norm(nd.pose[:3, 3] - gt[i][:3, 3])
        r_err = np.abs(nd.pose[:3, :3] - gt[i][:3, :3]).max()
        assert t_err < 1e-6, f"node {i}: translation err {t_err}"
        assert r_err < 1e-7, f"node {i}: rotation err {r_err}"


def test_ceres_scipy_loss_curve_identity():
    """The mapping used by SolverConfig must make scipy's robust cost the
    SAME curve as the Ceres loss the reference constructs
    (ref: pose_optimizer.cpp create_loss_function). scipy applies
    f_scale**2 * rho((f/f_scale)**2); Ceres applies rho(s) with s = f**2."""
    from scipy.optimize._lsq.least_squares import IMPLEMENTED_LOSSES

    def ceres_rho(name, s, a):
        if name == "HUBER_LOSS":  # ceres::HuberLoss(a)
            return np.where(s <= a * a, s,
                            2.0 * a * np.sqrt(s) - a * a)
        if name == "CAUCHY_LOSS":  # ceres::CauchyLoss(a)
            return a * a * np.log1p(s / (a * a))
        if name == "SOFT_L_ONE_LOSS":  # ceres::SoftLOneLoss(a)
            return 2.0 * a * a * (np.sqrt(1.0 + s / (a * a)) - 1.0)
        if name == "ARCTAN_LOSS":  # ceres::ArctanLoss(a)
            return a * np.arctan2(s, a)
        raise AssertionError(name)

    f = np.linspace(1e-3, 25.0, 400)  # residual magnitudes
    for name, a in [("HUBER_LOSS", 2.0), ("CAUCHY_LOSS", 1.3),
                    ("SOFT_L_ONE_LOSS", 0.7), ("ARCTAN_LOSS", 2.5)]:
        cfg = SolverConfig(loss=name, loss_scale=a)
        fs = cfg.scipy_loss_scale()
        z = (f / fs) ** 2
        rho = np.empty((3, z.size))
        IMPLEMENTED_LOSSES[cfg.scipy_loss()](z, rho, cost_only=False)
        scipy_cost = fs * fs * rho[0]
        np.testing.assert_allclose(
            scipy_cost, ceres_rho(name, f ** 2, a), rtol=1e-12,
            err_msg=name)


def test_loss_mapping_rejects_nothing_silently():
    for enum, scipy_name in [("HUBER_LOSS", "huber"),
                             ("CAUCHY_LOSS", "cauchy"),
                             ("SOFT_L_ONE_LOSS", "soft_l1"),
                             ("ARCTAN_LOSS", "arctan"),
                             ("TRIVIAL_LOSS", "linear")]:
        assert SolverConfig(loss=enum).scipy_loss() == scipy_name
