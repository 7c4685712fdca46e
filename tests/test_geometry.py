"""Geometry-layer conformance: OpenCV is the golden oracle here, since the
reference calls cv::undistortPoints / cv::findHomography /
cv::decomposeHomographyMat directly (src/optic_flow.cpp:549-592)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrs_optic_flow_tpu.geometry import (
    decompose_homography,
    find_homography_ransac,
    undistort_points,
    get_rt,
    get_2dt,
    get_inliers,
)
from mrs_optic_flow_tpu.geometry.rotations import (
    matrix_from_quat,
    quat_from_axis_angle,
    quat_from_matrix,
    quat_from_rpy,
    quat_rotate,
    rpy_from_quat,
    quat_angle,
)
from mrs_optic_flow_tpu.geometry.motion import grid_centers

cv2 = pytest.importorskip("cv2")

K = np.array([[420.0, 0, 376.0], [0, 420.0, 240.0], [0, 0, 1.0]])
DIST = np.array([-0.28, 0.07, 1e-4, -2e-4, -0.006])


def _rot(rng, scale=0.3):
    r, _ = np.linalg.qr(np.eye(3) + scale * rng.standard_normal((3, 3)))
    if np.linalg.det(r) < 0:
        r[:, 0] *= -1
    return r


# ------------------------------ rotations ---------------------------------


def test_quat_roundtrip(rng):
    for _ in range(20):
        r = _rot(rng, 1.0)
        q = quat_from_matrix(jnp.asarray(r))
        np.testing.assert_allclose(np.asarray(matrix_from_quat(q)), r, atol=1e-5)


def test_rpy_vs_scipy(rng):
    from scipy.spatial.transform import Rotation

    for _ in range(10):
        rpy = rng.uniform(-1.2, 1.2, 3)
        q = quat_from_rpy(*rpy)
        q_sp = Rotation.from_euler("xyz", rpy).as_quat()  # (x,y,z,w)
        assert min(np.abs(np.asarray(q) - q_sp).max(), np.abs(np.asarray(q) + q_sp).max()) < 1e-6
        back = np.array(rpy_from_quat(q))
        np.testing.assert_allclose(back, rpy, atol=1e-6)


def test_quat_rotate(rng):
    for _ in range(10):
        r = _rot(rng, 1.0)
        v = rng.standard_normal(3)
        q = quat_from_matrix(jnp.asarray(r))
        np.testing.assert_allclose(np.asarray(quat_rotate(q, jnp.asarray(v))), r @ v, atol=1e-5)


# ------------------------------ undistort ---------------------------------


def test_undistort_matches_opencv(rng):
    pts = rng.uniform(100, 650, size=(16, 2)).astype(np.float64)
    ours = np.asarray(undistort_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(DIST)))
    ref = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, DIST).reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


# ------------------------------ homography --------------------------------


def _apply_h(h, pts):
    p = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ h.T
    return p[:, :2] / p[:, 2:3]


def test_homography_clean(rng):
    h_true = np.eye(3) + 0.1 * rng.standard_normal((3, 3))
    h_true /= h_true[2, 2]
    src = rng.uniform(-0.5, 0.5, size=(16, 2))
    dst = _apply_h(h_true, src)
    res = find_homography_ransac(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        jnp.ones(16, bool),
        jax.random.PRNGKey(0),
    )
    assert bool(res.ok) and int(res.n_inliers) == 16
    np.testing.assert_allclose(np.asarray(res.h), h_true, atol=2e-3)


def test_homography_with_outliers_vs_opencv(rng):
    h_true = np.eye(3) + 0.05 * rng.standard_normal((3, 3))
    h_true /= h_true[2, 2]
    src = rng.uniform(-0.5, 0.5, size=(16, 2))
    dst = _apply_h(h_true, src) + rng.normal(0, 0.001, size=(16, 2))
    dst[3] += 0.3  # outliers
    dst[11] -= 0.25
    res = find_homography_ransac(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        jnp.ones(16, bool),
        jax.random.PRNGKey(1),
    )
    inl = np.asarray(res.inliers)
    assert not inl[3] and not inl[11]
    h_cv, mask_cv = cv2.findHomography(src, dst, cv2.RANSAC, 0.01)
    np.testing.assert_allclose(np.asarray(res.h), h_cv, atol=5e-3)


def test_homography_masked_points(rng):
    h_true = np.eye(3) + 0.05 * rng.standard_normal((3, 3))
    h_true /= h_true[2, 2]
    src = rng.uniform(-0.5, 0.5, size=(16, 2))
    dst = _apply_h(h_true, src)
    valid = np.ones(16, bool)
    valid[[0, 5, 9]] = False
    dst[0] = np.nan  # masked points may carry NaN without poisoning the fit
    res = find_homography_ransac(
        jnp.asarray(np.where(valid[:, None], src, 0.0), jnp.float32),
        jnp.asarray(np.where(valid[:, None], dst, 0.0), jnp.float32),
        jnp.asarray(valid),
        jax.random.PRNGKey(2),
    )
    assert bool(res.ok) and int(res.n_inliers) == 13
    np.testing.assert_allclose(np.asarray(res.h), h_true, atol=2e-3)


def _make_h(r, t, n):
    return r + np.outer(t, n)


def test_decompose_vs_opencv(rng):
    for trial in range(8):
        r = _rot(rng)
        n = np.array([0.1, -0.05, -1.0]) + 0.1 * rng.standard_normal(3)
        n /= np.linalg.norm(n)
        if n[2] > 0:
            n = -n  # plane in front of camera: n_z < 0 convention
        t = 0.3 * rng.standard_normal(3)
        h = _make_h(r, t, n)
        nsol, rs_cv, ts_cv, ns_cv = cv2.decomposeHomographyMat(h, np.eye(3))
        dec = decompose_homography(jnp.asarray(h, jnp.float32))
        assert int(dec.n_solutions) == 4
        # same solution *set* (order may differ): match each cv solution
        ours = [
            (np.asarray(dec.rotations[i]), np.asarray(dec.translations[i]), np.asarray(dec.normals[i]))
            for i in range(4)
        ]
        for rc, tc, nc in zip(rs_cv, ts_cv, ns_cv):
            errs = [
                np.abs(ro - rc).max() + np.abs(to - tc.ravel()).max() + np.abs(no - nc.ravel()).max()
                for ro, to, no in ours
            ]
            assert min(errs) < 1e-4, (trial, min(errs))
        # and the true (R, t, n) is among the solutions
        errs = [np.abs(ro - r).max() + np.abs(no - n).max() for ro, _, no in ours]
        assert min(errs) < 1e-4


def test_decompose_negative_det_yields_proper_rotations(rng):
    """OpenCV's HomographyDecomp normalizes to det(Hn) > 0; a sign(h22) flip
    is NOT equivalent — with det(H) < 0 and h22 > 0 it produced four
    improper rotations (det(R) = -1). Such H never comes from the in-
    pipeline findHomography (h22 = 1) but can come from a junk fit."""
    for trial in range(8):
        h = rng.standard_normal((3, 3))
        if np.linalg.det(h) > 0:
            h[0] = -h[0]
        if h[2, 2] < 0:
            h = h * np.sign(np.linalg.det(h))  # make h22's sign disagree
        if h[2, 2] < 0:
            continue  # both negative: not the failure shape
        dec = decompose_homography(jnp.asarray(h, jnp.float32))
        for i in range(int(dec.n_solutions)):
            d = np.linalg.det(np.asarray(dec.rotations[i]))
            assert d > 0.5, (trial, i, d)
        # and cv2 agrees on the solution set
        nsol, rs_cv, _, _ = cv2.decomposeHomographyMat(h, np.eye(3))
        ours = [np.asarray(dec.rotations[i]) for i in range(int(dec.n_solutions))]
        for rc in rs_cv[: int(dec.n_solutions)]:
            assert min(np.abs(ro - rc).max() for ro in ours) < 1e-4


def test_decompose_pure_rotation(rng):
    r = _rot(rng)
    dec = decompose_homography(jnp.asarray(r, jnp.float32))
    assert int(dec.n_solutions) == 1
    np.testing.assert_allclose(np.asarray(dec.rotations[0]), r, atol=1e-6)


# ------------------------------ get_rt / get_2dt ---------------------------


def _synthetic_shifts(v_cam, omega_cam, height, dt, frame_size=480, patch=120):
    """Generate the pixel shifts a camera moving at v (m/s) and rotating at
    omega (rad/s) above a flat floor at `height` would observe, ground truth
    for getRT: planar homography H = R + (t/d) n^T in normalized coords."""
    from scipy.spatial.transform import Rotation

    n = np.array([0.0, 0.0, -1.0])  # floor normal in camera frame (z fwd/down)
    r = Rotation.from_rotvec(np.asarray(omega_cam) * dt).as_matrix()
    t = np.asarray(v_cam) * dt / height
    h = r + np.outer(t, n)

    centers = grid_centers(frame_size, patch)
    cam_local = K.copy()
    # mimic processImage: crop centred on cx -> ulCorner.x = cx - frame/2
    ul_x = K[0, 2] - frame_size / 2
    cam_local[0, 2] -= ul_x
    und = cv2.undistortPoints(centers.reshape(-1, 1, 2).astype(np.float64), cam_local, DIST).reshape(-1, 2)
    moved = _apply_h(h, und)
    # re-distort/project back to pixels
    moved_px = cv2.projectPoints(
        np.concatenate([moved, np.ones((len(moved), 1))], axis=1),
        np.zeros(3), np.zeros(3), cam_local, DIST,
    )[0].reshape(-1, 2)
    return (moved_px - centers).astype(np.float32), ul_x


def test_get_rt_recovers_motion(rng):
    height, dt = 4.0, 0.05
    v_cam = np.array([1.2, -0.4, 0.0])
    omega = np.array([0.05, -0.1, 0.3])
    shifts, ul_x = _synthetic_shifts(v_cam, omega, height, dt)

    c2b = quat_from_rpy(0.0, 0.0, 0.0)  # camera == body for this test
    rate_q = quat_from_rpy(omega[0], omega[1], omega[2])  # setRPY on rates (:1313)
    res = get_rt(
        jnp.asarray(shifts),
        jnp.float32(height),
        jnp.float32(dt),
        jnp.float32(ul_x),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(DIST, jnp.float32),
        c2b,
        rate_q,
        jax.random.PRNGKey(0),
        frame_size=480,
        patch=120,
    )
    assert bool(res.ok)
    tran = np.asarray(res.tran)
    # v = R^T? the reference returns R*t*height/dt in camera frame; ground
    # truth: t = v*dt/height (camera frame), so tran ~ R @ v (small rotation)
    assert np.abs(tran - v_cam).max() < 0.15, tran
    # rotation rate: quaternion with angle/dt ~ |omega|
    from mrs_optic_flow_tpu.geometry.rotations import quat_axis_angle

    axis, ang = quat_axis_angle(res.rot)
    rate_vec = np.asarray(axis) * float(ang)
    assert np.abs(np.abs(rate_vec) - np.abs(omega)).max() < 0.05 or np.abs(rate_vec - omega).max() < 0.08


def test_get_rt_rejects_sparse(rng):
    shifts = np.full((16, 2), np.nan, np.float32)
    shifts[:5] = 1.0  # only 5 valid < shifted_pts_thr 8
    res = get_rt(
        jnp.asarray(shifts), jnp.float32(3.0), jnp.float32(0.05), jnp.float32(0.0),
        jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32),
        quat_from_rpy(0.0, 0.0, 0.0), quat_from_rpy(0.0, 0.0, 0.0),
        jax.random.PRNGKey(0), frame_size=480, patch=120,
    )
    assert not bool(res.ok)
    assert np.all(np.isnan(np.asarray(res.tran)))


def test_get_2dt_basic():
    shifts = np.array([[np.nan, np.nan], [6.0, -3.0]], np.float32)  # first invalid
    height, dt = 2.0, 0.1
    res = get_2dt(
        jnp.asarray(shifts), jnp.float32(height), jnp.float32(dt), jnp.float32(0.0),
        jnp.asarray(K, jnp.float32), jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    )
    assert bool(res.ok)
    tran = np.asarray(res.tran)
    # v = -shift * height/f * ratio / dt  (src/optic_flow.cpp:491-495)
    exp = -np.array([6.0 * height / K[0, 0] * 4, -3.0 * height / K[1, 1] * 4, 0.0]) / dt
    np.testing.assert_allclose(tran, exp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.tran_diff), 0.0, atol=1e-7)


def test_get_2dt_rate_correction():
    shifts = np.zeros((1, 2), np.float32)
    res = get_2dt(
        jnp.asarray(shifts), jnp.float32(2.0), jnp.float32(0.1), jnp.float32(0.0),
        jnp.asarray(K, jnp.float32), jnp.float32(0.2), jnp.float32(-0.1), jnp.float32(0.0),
    )
    assert bool(res.ok)
    # zero shift + nonzero rates -> nonzero feed-forward velocity and diff
    assert np.abs(np.asarray(res.tran)[:2]).min() > 0
    np.testing.assert_allclose(np.asarray(res.tran_diff), np.asarray(res.tran), rtol=1e-5)


def test_get_2dt_rate_correction_axis_map():
    """The rebuilt feed-forward (deviation 21): a camera pitching at +p
    with ZERO measured flow implies translational flow that cancelled the
    rotational flow, i.e. v_x = -p*h (and roll r -> v_y = +r*h) at the
    identity mount (cam_yaw = pi/2).  The reference's transcribed map
    (det -1) cannot produce this for any cam_yaw
    (``src/optic_flow.cpp:478-488``; geometry/motion.py docstring)."""
    h, dt = 2.0, 0.1
    zero = np.zeros((1, 2), np.float32)

    def run(roll, pitch, cam_yaw):
        res = get_2dt(
            jnp.asarray(zero), jnp.float32(h), jnp.float32(dt),
            jnp.float32(0.0), jnp.asarray(K, jnp.float32),
            jnp.float32(roll), jnp.float32(pitch), jnp.float32(cam_yaw),
        )
        return np.asarray(res.tran)

    p = 0.5
    tran = run(0.0, p, np.pi / 2)
    np.testing.assert_allclose(
        tran[:2], [-np.tan(p * dt) * h / dt, 0.0], rtol=1e-5, atol=1e-6
    )
    r = 0.4
    tran = run(r, 0.0, np.pi / 2)
    np.testing.assert_allclose(
        tran[:2], [0.0, np.tan(r * dt) * h / dt], rtol=1e-5, atol=1e-6
    )
    # a 90-deg z mount (cam_yaw = 0): body pitch becomes camera -roll,
    # body roll becomes camera +pitch
    tran = run(r, 0.0, 0.0)
    np.testing.assert_allclose(
        tran[:2], [np.tan(r * dt) * h / dt, 0.0], rtol=1e-5, atol=1e-6
    )
    tran = run(0.0, p, 0.0)
    np.testing.assert_allclose(
        tran[:2], [0.0, np.tan(p * dt) * h / dt], rtol=1e-5, atol=1e-6
    )


def test_get_inliers():
    shifts = jnp.asarray(
        np.array([[1, 1], [1.1, 0.9], [0.9, 1.0], [5, 5], [1.05, 1.0]], np.float32)
    )
    valid = jnp.ones(5, bool)
    mask = np.asarray(get_inliers(shifts, valid, 0.5))
    assert mask.tolist() == [True, True, True, False, True]


def test_get_2dt_ratio2_inlier_vote():
    """Ratio-2 long-range policy: mutual-agreement inliers averaged,
    >= 3 required (src/optic_flow.cpp:414-421, :452-467)."""
    shifts = np.array(
        [[4.0, -1.0], [4.2, -0.8], [3.9, -1.1], [30.0, 30.0]], np.float32
    )
    res = get_2dt(
        jnp.asarray(shifts), jnp.float32(2.0), jnp.float32(0.1), jnp.float32(0.0),
        jnp.asarray(K, jnp.float32), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0), long_range_ratio=2,
    )
    assert bool(res.ok)
    exp_shift = shifts[:3].mean(0)
    exp = -np.array([
        exp_shift[0] * 2.0 / K[0, 0] * 2, exp_shift[1] * 2.0 / K[1, 1] * 2, 0.0
    ]) / 0.1
    np.testing.assert_allclose(np.asarray(res.tran), exp, rtol=1e-5)
    # fewer than 3 inliers -> not ok
    res2 = get_2dt(
        jnp.asarray(shifts[2:]), jnp.float32(2.0), jnp.float32(0.1), jnp.float32(0.0),
        jnp.asarray(K, jnp.float32), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0), long_range_ratio=2,
    )
    assert not bool(res2.ok)


def test_get_2dt_ratio2_inlier_threshold_is_15():
    """Parity: LONGRANGE_INLIER_THRESHOLD is 15 px (src/optic_flow.cpp:34,
    :456).  Points mutually spread 3-14 px apart are all within the 15 px
    gate and must be averaged together; a 2 px gate (the round-1 bug) would
    reject this spread and fail the vote."""
    from mrs_optic_flow_tpu.geometry.motion import LONGRANGE_INLIER_THRESHOLD

    assert LONGRANGE_INLIER_THRESHOLD == 15.0
    # pairwise distances range ~3..14 px — all < 15, none < 2
    shifts = np.array(
        [[0.0, 0.0], [3.0, 0.0], [0.0, 7.0], [-6.0, -4.0]], np.float32
    )
    d = np.linalg.norm(shifts[:, None] - shifts[None, :], axis=-1)
    offdiag = d[~np.eye(4, dtype=bool)]
    assert offdiag.min() > 2.0 and offdiag.max() < 15.0
    res = get_2dt(
        jnp.asarray(shifts), jnp.float32(2.0), jnp.float32(0.1), jnp.float32(0.0),
        jnp.asarray(K, jnp.float32), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0), long_range_ratio=2,
    )
    assert bool(res.ok)
    exp_shift = shifts.mean(0)
    exp = -np.array([
        exp_shift[0] * 2.0 / K[0, 0] * 2, exp_shift[1] * 2.0 / K[1, 1] * 2, 0.0
    ]) / 0.1
    np.testing.assert_allclose(np.asarray(res.tran), exp, rtol=1e-5, atol=1e-6)


def test_homography_too_few_valid_points():
    """< 4 valid points cannot fit a homography -> ok False, identity H."""
    src = np.zeros((16, 2), np.float32)
    dst = np.zeros((16, 2), np.float32)
    valid = np.zeros(16, bool)
    valid[:3] = True
    res = find_homography_ransac(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), jax.random.PRNGKey(0)
    )
    assert not bool(res.ok)
    np.testing.assert_array_equal(np.asarray(res.h), np.eye(3, dtype=np.float32))


def test_get_rt_all_nan_shifts():
    shifts = np.full((16, 2), np.nan, np.float32)
    res = get_rt(
        jnp.asarray(shifts), jnp.float32(2.0), jnp.float32(0.05), jnp.float32(0.0),
        jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32),
        quat_from_rpy(0.0, 0.0, 0.0), quat_from_rpy(0.0, 0.0, 0.0),
        jax.random.PRNGKey(0), frame_size=480, patch=120,
    )
    assert not bool(res.ok)


def test_get_rt_zero_dt():
    """dt == 0 -> 1/dt infinite -> rejected (src/optic_flow.cpp:517-520)."""
    shifts = np.ones((16, 2), np.float32)
    res = get_rt(
        jnp.asarray(shifts), jnp.float32(2.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32),
        quat_from_rpy(0.0, 0.0, 0.0), quat_from_rpy(0.0, 0.0, 0.0),
        jax.random.PRNGKey(0), frame_size=480, patch=120,
    )
    assert not bool(res.ok)


def test_decompose_batched():
    """decompose_homography broadcasts over leading batch dims."""
    rng_ = np.random.default_rng(3)
    hs = []
    for _ in range(3):
        r = _rot(rng_)
        n = np.array([0.0, 0.1, -1.0]); n /= np.linalg.norm(n)
        t = 0.2 * rng_.standard_normal(3)
        hs.append(r + np.outer(t, n))
    dec = decompose_homography(jnp.asarray(np.stack(hs), jnp.float32))
    assert dec.rotations.shape == (3, 4, 3, 3)
    assert dec.translations.shape == (3, 4, 3)
    # each solution set is self-consistent: H_n ~ R + t n^T
    for b in range(3):
        hn = np.asarray(hs[b]) / np.linalg.svd(hs[b], compute_uv=False)[1]
        recon = np.asarray(dec.rotations[b, 0]) + np.outer(
            np.asarray(dec.translations[b, 0]), np.asarray(dec.normals[b, 0])
        )
        assert np.abs(recon - hn).max() < 5e-3  # f32 decomposition precision


def test_qr_null_matches_svd(rng):
    """The production refit (Householder QR + seeded inverse iteration)
    matches the SVD null vector on noisy DLT systems."""
    from mrs_optic_flow_tpu.geometry import homography as hg

    for trial in range(10):
        h_true = np.eye(3) + 0.3 * rng.standard_normal((3, 3))
        h_true /= h_true[2, 2]
        src = rng.standard_normal((16, 2)) * 0.5
        ph = np.concatenate([src, np.ones((16, 1))], 1) @ h_true.T
        dst = ph[:, :2] / ph[:, 2:3] + 1e-4 * rng.standard_normal((16, 2))
        a = hg._dlt_rows(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
            jnp.ones((16,), jnp.float32),
        )
        h_svd = np.asarray(hg._solve_h_svd(a))
        seed = jnp.asarray(
            h_true + 0.05 * rng.standard_normal((3, 3)), jnp.float32
        )
        h_qr = np.asarray(hg._solve_h_qr_null(a, seed))
        np.testing.assert_allclose(h_qr, h_svd, atol=2e-4)
        # batched shape contract
        hb = hg._solve_h_qr_null(jnp.stack([a] * 3), jnp.stack([seed] * 3))
        assert hb.shape == (3, 3, 3)


def test_h4_closed_form_matches_dlt_null(rng):
    """The batched RANSAC hypothesis solver (_h4_b, canonical-basis closed
    form) equals the 4-point DLT null space: same h (up to scale) as the
    SVD solve, and H maps the 4 source points onto the targets exactly."""
    from mrs_optic_flow_tpu.geometry import homography as hg
    from mrs_optic_flow_tpu.geometry.batched import _h4_b

    i_n, b_n = 4, 6
    x4, y4, u4, v4 = (
        rng.uniform(-1.0, 1.0, (i_n, 4, b_n)).astype(np.float32) for _ in range(4)
    )
    h = np.asarray(_h4_b(*(jnp.asarray(c) for c in (x4, y4, u4, v4))))
    assert h.shape == (i_n, 9, b_n)
    for i in range(i_n):
        for b in range(b_n):
            src = np.stack([x4[i, :, b], y4[i, :, b]], -1)
            dst = np.stack([u4[i, :, b], v4[i, :, b]], -1)
            a = hg._dlt_rows(
                jnp.asarray(src), jnp.asarray(dst), jnp.ones((4,), jnp.float32)
            )
            ref = np.asarray(hg._solve_h_svd(a)).reshape(9)
            got = h[i, :, b]
            np.testing.assert_allclose(
                got / got[8], ref / ref[8], atol=2e-3, rtol=1e-3
            )
            hm = got.reshape(3, 3)
            p = np.concatenate([src, np.ones((4, 1))], -1).T
            q = hm @ p
            np.testing.assert_allclose((q[:2] / q[2]).T, dst, atol=1e-4)


def test_middle_singular_value_closed_form(rng):
    """Trigonometric 3x3 middle singular value vs numpy SVD, including the
    isotropic (pure scaled rotation) edge case."""
    from mrs_optic_flow_tpu.geometry.homography import _sv_middle_3x3

    hs = [np.eye(3) + 0.5 * rng.standard_normal((3, 3)) for _ in range(20)]
    hs.append(2.5 * np.eye(3))  # isotropic: p == 0 branch
    for h in hs:
        ref = np.linalg.svd(h.astype(np.float32), compute_uv=False)[1]
        got = float(_sv_middle_3x3(jnp.asarray(h, jnp.float32)))
        np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.slow
def test_get_rt_batch_matches_per_sample(rng):
    """The batch-last serving geometry (geometry/batched.py) agrees with the
    reference per-sample chain on consensus-stable data — RANSAC draws
    differ (module docstring), so equality is statistical, not bitwise."""
    import functools
    from mrs_optic_flow_tpu.geometry.batched import get_rt_batch

    b = 5
    cam = jnp.asarray([[300.0, 0, 240.0], [0, 300.0, 240.0], [0, 0, 1]], jnp.float32)
    shifts = np.tile(rng.normal(6.0, 0.5, size=(b, 1, 2)), (1, 16, 1))
    shifts = shifts + 0.02 * rng.standard_normal((b, 16, 2))
    shifts = jnp.asarray(shifts, jnp.float32)
    heights = jnp.asarray(rng.uniform(2, 8, b), jnp.float32)
    dts = jnp.full((b,), 0.02, jnp.float32)
    c2b = jnp.asarray([0, 0, 0, 1], jnp.float32)
    rates = jnp.tile(jnp.asarray([0, 0, 0, 1], jnp.float32), (b, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), b)

    for dist in (None, jnp.asarray([0.1, -0.05, 0.001, -0.002, 0.01], jnp.float32)):
        ref = jax.vmap(
            functools.partial(get_rt, frame_size=480, patch=120, ransac_iterations=128),
            in_axes=(0, 0, 0, None, None, None, None, 0, 0),
        )(shifts, heights, dts, jnp.float32(20.0), cam, dist, c2b, rates, keys)
        got = get_rt_batch(
            shifts, heights, dts, jnp.float32(20.0), cam, dist, c2b, rates, keys,
            frame_size=480, patch=120, ransac_iterations=128,
        )
        np.testing.assert_array_equal(np.asarray(ref.ok), np.asarray(got.ok))
        np.testing.assert_allclose(
            np.asarray(ref.tran), np.asarray(got.tran), atol=5e-3
        )
        np.testing.assert_allclose(
            np.abs(np.asarray(ref.rot)), np.abs(np.asarray(got.rot)), atol=1e-3
        )


def test_get_rt_batch_rejects_outliers(rng):
    """RANSAC with closed-form hypotheses still finds the translation
    consensus when a quarter of the windows are corrupted: the outliers
    must not land in the inlier set, and the velocity must match the
    clean-batch estimate."""
    from mrs_optic_flow_tpu.geometry.batched import get_rt_batch

    b = 4
    cam = jnp.asarray([[300.0, 0, 240.0], [0, 300.0, 240.0], [0, 0, 1]], jnp.float32)
    clean = np.tile(np.array([5.0, -3.0], np.float32), (b, 16, 1))
    clean += 0.01 * rng.standard_normal((b, 16, 2)).astype(np.float32)
    dirty = clean.copy()
    dirty[:, ::4] += rng.uniform(25.0, 40.0, (b, 4, 2)).astype(np.float32)
    args = (
        jnp.full((b,), 2.0), jnp.full((b,), 0.02), jnp.float32(20.0), cam,
        None, jnp.asarray([0, 0, 0, 1], jnp.float32),
        jnp.tile(jnp.asarray([0, 0, 0, 1], jnp.float32), (b, 1)),
        jax.random.split(jax.random.PRNGKey(3), b),
    )
    kw = dict(frame_size=480, patch=120, ransac_iterations=256)
    ref = get_rt_batch(jnp.asarray(clean), *args, **kw)
    got = get_rt_batch(jnp.asarray(dirty), *args, **kw)
    assert np.asarray(got.ok).all()
    assert (np.asarray(got.n_inliers) == 12).all()  # the 12 clean windows
    np.testing.assert_allclose(
        np.asarray(got.tran), np.asarray(ref.tran), atol=0.05
    )


def test_get_rt_batch_nan_gating(rng):
    """Batched geometry reproduces the NaN/threshold gating: a sample with
    too few valid windows comes back not-ok and NaN."""
    from mrs_optic_flow_tpu.geometry.batched import get_rt_batch

    b = 3
    cam = jnp.asarray([[300.0, 0, 240.0], [0, 300.0, 240.0], [0, 0, 1]], jnp.float32)
    shifts = np.tile(np.array([5.0, -3.0], np.float32), (b, 16, 1))
    shifts[1, 4:] = np.nan  # 4 valid < shifted_pts_thr=8
    out = get_rt_batch(
        jnp.asarray(shifts), jnp.full((b,), 4.0), jnp.full((b,), 0.05),
        jnp.float32(20.0), cam, None, jnp.asarray([0, 0, 0, 1], jnp.float32),
        jnp.tile(jnp.asarray([0, 0, 0, 1], jnp.float32), (b, 1)),
        jax.random.split(jax.random.PRNGKey(1), b),
        frame_size=480, patch=120, ransac_iterations=64,
    )
    ok = np.asarray(out.ok)
    assert ok[0] and ok[2] and not ok[1]
    assert np.all(np.isnan(np.asarray(out.tran)[1]))
    assert np.all(np.isfinite(np.asarray(out.tran)[0]))


def test_get_rt_batch_bad_dt(rng):
    """dt <= 0 poisons only the affected sample (reference rejects
    negative/zero dt, src/optic_flow.cpp:1425-1433)."""
    from mrs_optic_flow_tpu.geometry.batched import get_rt_batch

    b = 3
    cam = jnp.asarray([[300.0, 0, 240.0], [0, 300.0, 240.0], [0, 0, 1]], jnp.float32)
    shifts = jnp.asarray(np.tile(np.array([5.0, -3.0], np.float32), (b, 16, 1)))
    dts = jnp.asarray([0.05, 0.0, 0.05], jnp.float32)
    out = get_rt_batch(
        shifts, jnp.full((b,), 4.0), dts, jnp.float32(20.0), cam, None,
        jnp.asarray([0, 0, 0, 1], jnp.float32),
        jnp.tile(jnp.asarray([0, 0, 0, 1], jnp.float32), (b, 1)),
        jax.random.split(jax.random.PRNGKey(1), b),
        frame_size=480, patch=120, ransac_iterations=64,
    )
    ok = np.asarray(out.ok)
    assert ok[0] and ok[2] and not ok[1]
    assert np.all(np.isnan(np.asarray(out.tran)[1]))


def test_get_rt_batch_per_sample_ul_corner(rng):
    """A [B] ``ul_corner_x`` (per-sample crop offsets) is honored per
    sample: before round 5 the undistorted grid was silently sliced to
    sample 0's column, feeding every sample homographies fit against the
    wrong grid centres."""
    from mrs_optic_flow_tpu.geometry.batched import get_rt_batch

    b = 3
    cam = jnp.asarray([[300.0, 0, 240.0], [0, 300.0, 240.0], [0, 0, 1]], jnp.float32)
    shifts = np.tile(rng.normal(5.0, 0.3, size=(b, 1, 2)), (1, 16, 1))
    shifts = jnp.asarray(
        shifts + 0.02 * rng.standard_normal((b, 16, 2)), jnp.float32
    )
    heights = jnp.full((b,), 3.0, jnp.float32)
    dts = jnp.full((b,), 0.02, jnp.float32)
    c2b = jnp.asarray([0, 0, 0, 1], jnp.float32)
    rates = jnp.tile(jnp.asarray([0, 0, 0, 1], jnp.float32), (b, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    uls = jnp.asarray([0.0, 60.0, 140.0], jnp.float32)
    kw = dict(frame_size=480, patch=120, ransac_iterations=128)

    got = get_rt_batch(shifts, heights, dts, uls, cam, None, c2b, rates,
                       keys, **kw)
    assert np.asarray(got.ok).all(), got
    # each sample must agree with a batch-of-one run at its own scalar ul
    for i in range(b):
        one = get_rt_batch(
            shifts[i:i + 1], heights[i:i + 1], dts[i:i + 1],
            jnp.float32(float(uls[i])), cam, None, c2b, rates[i:i + 1],
            keys[i:i + 1], **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got.tran[i]), np.asarray(one.tran[0]), atol=5e-3
        )


def test_h4_b_hypothesis_scale_normalization(rng):
    """``_h4_b`` hypotheses come back max-abs-normalized to O(1), so
    ``_project_err2_b``'s absolute 1e-12 denominator clamp can never bite
    a genuine denominator.  The raw adjugate product scales as ~s^8 of the
    coordinate scale: at s = 0.005 (a very-long-focal normalized grid) the
    un-normalized entries sit near 1e-18, every denominator got replaced
    by the clamp, and the EXACT defining correspondences scored huge
    errors — the pre-round-5 fragility this pins."""
    from mrs_optic_flow_tpu.geometry.batched import _h4_b, _project_err2_b

    for s in (1.0, 0.05, 0.005):
        pts = rng.uniform(-1.0, 1.0, (4, 2)).astype(np.float32) * s
        t = np.array([0.3, -0.2], np.float32) * s
        tile = lambda a: jnp.asarray(  # noqa: E731
            np.tile(a[None, :, None], (2, 1, 3)), jnp.float32
        )  # [I=2, 4, B=3]
        x4, y4 = tile(pts[:, 0]), tile(pts[:, 1])
        u4, v4 = x4 + t[0], y4 + t[1]
        h = _h4_b(x4, y4, u4, v4)  # [2, 9, 3]
        # normalized to O(1) at every coordinate scale
        np.testing.assert_allclose(
            np.max(np.abs(np.asarray(h)), axis=1), 1.0, rtol=1e-5
        )
        # the exact defining correspondences score ~zero error (pre-fix,
        # at s=0.005 the clamp replaced every denominator and these exact
        # points scored err2 >> threshold^2 = 1e-4)
        ax = jnp.asarray(np.tile(pts[:, 0][:, None], (1, 3)), jnp.float32)
        ay = jnp.asarray(np.tile(pts[:, 1][:, None], (1, 3)), jnp.float32)
        err2 = _project_err2_b(h, ax, ay, ax + t[0], ay + t[1])
        assert float(jnp.max(err2)) < 1e-9, (s, np.asarray(err2))
