import jax
import jax.numpy as jnp
import numpy as np

import shapeclipper_tpu.losses as L


def test_mse_and_l1_basic():
    pred = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    assert float(L.mse_loss(pred, pred)) == 0.0
    np.testing.assert_allclose(float(L.l1_loss(pred, 0.0)), 2.5)
    # weighted
    w = jnp.array([[1.0, 1.0], [0.0, 0.0]])
    np.testing.assert_allclose(float(L.mse_loss(pred, 0.0, weight=w)),
                               (1 + 4) / 4)


def test_mse_tolerance_drops_worst():
    # [B=1, N=4, C=1]: losses 0,1,4,9 -> drop worst 25% -> mean(0,1,4)
    pred = jnp.array([[[0.0], [1.0], [2.0], [3.0]]])
    out = L.mse_loss(pred, 0.0, tolerance=0.25)
    np.testing.assert_allclose(float(out), (0 + 1 + 4) / 3, rtol=1e-6)


def test_iou_loss_perfect_and_disjoint():
    a = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(L.iou_loss(a, a)), 0.0, atol=1e-6)
    b = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    np.testing.assert_allclose(float(L.iou_loss(a, b)), 1.0, atol=1e-6)


def test_iou_loss_tolerance_replaces_outliers():
    a = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    b = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    # tolerance 0.25 replaces the single worst pixel -> perfect IoU
    np.testing.assert_allclose(float(L.iou_loss(a, b, tolerance=0.25)),
                               0.0, atol=1e-6)


def test_normal_loss_matches_numpy_reference():
    rng = np.random.RandomState(0)
    B, R = 2, 50
    pred = rng.randn(B, R, 3).astype(np.float32)
    pred /= np.linalg.norm(pred, axis=-1, keepdims=True)
    gt = rng.randn(B, R, 3).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    mask = rng.rand(B, R) > 0.4
    tol = 0.2

    # direct numpy port of the reference (dynamic shapes ok on host)
    cos = (pred[mask] * gt[mask]).sum(-1)
    ang = 1 - cos
    l1 = np.abs(pred[mask] - gt[mask]).sum(-1)
    loss = 5 * l1 + ang
    idx = np.argsort(ang, kind="stable")[:int(loss.shape[0] * (1 - tol))]
    expected = loss[idx].mean()

    got = L.normal_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask),
                        normal_l1=5.0, tolerance=tol)
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_normal_loss_no_tolerance_equals_masked_mean():
    rng = np.random.RandomState(1)
    pred = rng.randn(1, 20, 3).astype(np.float32)
    gt = rng.randn(1, 20, 3).astype(np.float32)
    mask = rng.rand(1, 20) > 0.5
    got = L.normal_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask),
                        normal_l1=5.0, tolerance=0.0)
    cos = (pred[mask] * gt[mask]).sum(-1)
    l1 = np.abs(pred[mask] - gt[mask]).sum(-1)
    expected = (5 * l1 + 1 - cos).mean()
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_cam_uniform_loss_uniform_batch_is_small():
    B = 16
    angles = (np.arange(1, 2 * B, 2) * np.pi / B)  # exactly the prior grid
    trig = jnp.stack([jnp.cos(jnp.asarray(angles)),
                      jnp.sin(jnp.asarray(angles))], -1)
    val = float(L.cam_uniform_loss(trig, emd_p=2))
    assert val < 1e-5
    # a collapsed distribution scores much worse
    collapsed = jnp.broadcast_to(jnp.array([[1.0, 0.0]]), (B, 2))
    assert float(L.cam_uniform_loss(collapsed, emd_p=2)) > 0.05


def test_cam_margin():
    # angle 0 inside [-90, 90]: no loss
    trig = jnp.array([[1.0, 0.0]])
    assert float(L.cam_margin(trig, [-90, 90])) == 0.0
    # angle 120 outside by 25 deg beyond eps=5
    ang = np.deg2rad(120)
    trig = jnp.array([[np.cos(ang), np.sin(ang)]])
    np.testing.assert_allclose(float(L.cam_margin(trig, [-90, 90])), 25.0,
                               rtol=1e-4)


def test_cam_sym_loss_zero_for_consistent():
    a = jnp.array([[0.6, 0.8]])
    e = jnp.array([[1.0, 0.0]])
    t = jnp.array([[0.9, -0.435889894]])
    flipped = (jnp.array([[0.6, -0.8]]), e, jnp.array([[0.9, 0.435889894]]))
    assert float(L.cam_sym_loss((a, e, t), flipped)) < 1e-10


def test_category_reg_loss_prefers_own_center():
    centers = jnp.eye(4, 64)
    codes = centers[:3] * 10
    labels = jnp.array([0, 1, 2])
    good = float(L.category_reg_loss(codes, centers, labels))
    bad = float(L.category_reg_loss(codes, centers, jnp.array([1, 2, 3])))
    assert good < bad


def test_ce_loss_matches_softmax():
    logits = jnp.array([[2.0, 0.0, -1.0]])
    labels = jnp.array([0])
    expected = -np.log(np.exp(2) / (np.exp(2) + 1 + np.exp(-1)))
    np.testing.assert_allclose(float(L.ce_loss(logits, labels)), expected,
                               rtol=1e-5)
