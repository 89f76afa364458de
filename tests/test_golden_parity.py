"""Golden numeric parity against the ACTUAL reference implementation.

torch 2.13 (CPU) is installed on this machine and the reference's implicit
nets, renderer, losses, and camera math (`/root/reference/model/implicit.py`,
`model/renderer.py`, `model/loss.py`, `utils/camera.py`) run without
torchvision/CUDA. These tests drive both implementations with IDENTICAL
weights and inputs and assert <=1e-5 agreement — the strongest parity
evidence available without real Pix3D data. Skipped cleanly when torch or
the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
if not os.path.isdir(REF_ROOT):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

import model.implicit as ref_implicit      # noqa: E402
import model.loss as ref_loss_mod          # noqa: E402
import model.renderer as ref_renderer_mod  # noqa: E402
import utils.camera as ref_camera          # noqa: E402

import jax                                  # noqa: E402
import jax.numpy as jnp                     # noqa: E402

from shapeclipper_tpu import camera as our_camera           # noqa: E402
from shapeclipper_tpu import losses as L                    # noqa: E402
from shapeclipper_tpu.config import options                 # noqa: E402
from shapeclipper_tpu.models import implicit as our_implicit  # noqa: E402
from shapeclipper_tpu.render import renderer as our_renderer  # noqa: E402
from shapeclipper_tpu.utils.easydict import EasyDict as edict  # noqa: E402

ATOL = 1e-5
RTOL = 1e-5


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _n(x):
    return np.asarray(x)


def _close(a, b, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(_n(a), _n(b), atol=atol, rtol=rtol)


@pytest.fixture(scope="module")
def opt():
    o = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/pix3d/config.yaml"))
    o.H = o.W = 4                      # 16 rays
    o.device = "cpu"                   # reference camera helpers read this
    o.render.n_samples_uniform = 8
    return o


# ---------------------------------------------------------------------------
# weight transfer: torch state_dict -> flax param trees
# ---------------------------------------------------------------------------

def _mlp_params_from_torch(net, n_layers):
    params = {}
    for l in range(n_layers):
        lin = getattr(net, f"lin{l}")
        params[f"lin{l}"] = {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }
    return params


@pytest.fixture(scope="module")
def sdf_pair(opt):
    torch.manual_seed(0)
    ref = ref_implicit.SDFNetwork(opt)
    params = _mlp_params_from_torch(ref, opt.arch.impl_sdf.n_hidden_layers + 1)
    ours = our_implicit.SDFNetwork.from_opt(opt)
    return ref, ours, params


@pytest.fixture(scope="module")
def rgb_pair(opt):
    torch.manual_seed(1)
    ref = ref_implicit.RGBNetwork(opt)
    params = _mlp_params_from_torch(ref, opt.arch.impl_rgb.n_hidden_layers + 1)
    ours = our_implicit.RGBNetwork.from_opt(opt)
    return ref, ours, params


# ---------------------------------------------------------------------------
# positional encoding
# ---------------------------------------------------------------------------

def test_embedder_parity():
    embed_fn, out_dim = ref_implicit.get_embedder(6, input_dims=3)
    x = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    ref = embed_fn(_t(x)).numpy()
    ours = our_implicit.positional_encoding(jnp.asarray(x), 6)
    assert out_dim == our_implicit.posenc_dim(6)
    _close(ours, ref)


# ---------------------------------------------------------------------------
# Laplace density
# ---------------------------------------------------------------------------

def test_laplace_density_parity():
    beta0 = 0.1
    ref = ref_implicit.LaplaceDensity(params_init={"beta": beta0})
    sdf = np.random.RandomState(1).randn(200).astype(np.float32) * 0.3
    ref_out = ref(_t(sdf)).detach().numpy()
    ours = our_implicit.laplace_density(jnp.asarray(sdf), jnp.asarray(beta0))
    _close(ours, ref_out)
    # analytic derivative vs torch autograd
    s = _t(sdf).requires_grad_(True)
    ref.forward(s).sum().backward()
    ours_d = our_implicit.laplace_density_dsdf(jnp.asarray(sdf),
                                               jnp.asarray(beta0))
    _close(ours_d, s.grad.numpy())


# ---------------------------------------------------------------------------
# SDF / RGB networks with identical weights
# ---------------------------------------------------------------------------

def test_sdf_network_forward_parity(opt, sdf_pair):
    ref, ours, params = sdf_pair
    rng = np.random.RandomState(2)
    B, N = 2, 40
    pts = rng.uniform(-0.6, 0.6, (B, N, 3)).astype(np.float32)
    lat = rng.randn(B, opt.arch.impl_sdf.proj_latent_dim).astype(np.float32)

    lat_rep = _t(lat)[:, None].repeat(1, N, 1).reshape(B * N, -1)
    ref_out = ref.forward(_t(pts).reshape(B * N, 3), lat_rep)
    ref_out = ref_out.detach().numpy().reshape(B, N, -1)

    our_out = ours.apply({"params": params}, jnp.asarray(pts),
                         jnp.asarray(lat))
    _close(our_out, ref_out)


def test_sdf_gradient_parity(opt, sdf_pair):
    """get_conditional_output(compute_grad=True) vs sdf_with_gradient:
    values, features AND spatial gradients (the double-backward surface)."""
    ref, ours, params = sdf_pair
    rng = np.random.RandomState(3)
    B, N = 2, 32
    pts = rng.uniform(-0.6, 0.6, (B, N, 3)).astype(np.float32)
    lat = rng.randn(B, opt.arch.impl_sdf.proj_latent_dim).astype(np.float32)

    sdf_r, feat_r, grad_r = ref.get_conditional_output(
        edict(arch=edict(impl_sdf=edict(
            proj_latent_dim=opt.arch.impl_sdf.proj_latent_dim))),
        B, _t(pts).reshape(B * N, 3), _t(lat), compute_grad=True)

    sdf_o, feat_o, grad_o = our_implicit.sdf_with_gradient(
        ours.apply, params, jnp.asarray(pts), jnp.asarray(lat),
        detach_latent=True)
    _close(sdf_o.reshape(-1, 1), sdf_r.detach().numpy())
    _close(feat_o.reshape(B * N, -1), feat_r.detach().numpy())
    _close(grad_o.reshape(B * N, 3), grad_r.detach().numpy())


def test_rgb_network_forward_parity(opt, rgb_pair):
    ref, ours, params = rgb_pair
    rng = np.random.RandomState(4)
    B, N = 2, 40
    pts = rng.uniform(-0.6, 0.6, (B, N, 3)).astype(np.float32)
    lat = rng.randn(B, opt.arch.impl_rgb.proj_latent_dim).astype(np.float32)
    feat = rng.randn(B, N, opt.arch.impl_sdf.n_channels).astype(np.float32)

    lat_rep = _t(lat)[:, None].repeat(1, N, 1).reshape(B * N, -1)
    ref_out = ref.forward(_t(pts).reshape(B * N, 3), lat_rep,
                          _t(feat).reshape(B * N, -1))
    ref_out = ref_out.detach().numpy().reshape(B, N, 3)

    our_out = ours.apply({"params": params}, jnp.asarray(pts),
                         jnp.asarray(lat), jnp.asarray(feat))
    _close(our_out, ref_out)


def test_geometric_init_structure_and_sphere(opt, sdf_pair):
    """Geometric sphere init: zero masks, per-layer weight statistics, and
    the induced SDF ~ ||x|| - radius, for both frameworks' OWN inits
    (reference `model/implicit.py:114-128`)."""
    ref, ours, ref_params = sdf_pair
    state = ours.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, 3)),
                      jnp.zeros((1, opt.arch.impl_sdf.proj_latent_dim)))
    p = state["params"]
    a = opt.arch.impl_sdf
    dims0 = our_implicit.posenc_dim(a.pos_enc) + a.proj_latent_dim
    n_layers = a.n_hidden_layers + 1

    for l in range(n_layers):
        Ko = np.asarray(p[f"lin{l}"]["kernel"])          # [in, out]
        Kr = getattr(ref, f"lin{l}").weight.detach().numpy().T
        assert Ko.shape == Kr.shape, l
        if l == n_layers - 1:
            mean = np.sqrt(np.pi) / np.sqrt(Ko.shape[0])
            assert abs(Ko.mean() - mean) < 1e-4
            assert abs(Kr.mean() - mean) < 1e-4
            _close(p[f"lin{l}"]["bias"],
                   getattr(ref, f"lin{l}").bias.detach().numpy())
        elif l == 0:
            # only raw-xyz rows nonzero
            assert np.all(Ko[3:] == 0) and np.all(Kr[3:] == 0)
            assert Ko[:3].std() > 0
        elif l in a.skip_connection:
            tail = dims0 - 3
            assert np.all(Ko[-tail:] == 0) and np.all(Kr[-tail:] == 0)
            # matched std on the live rows (~sqrt(2)/sqrt(out))
            assert abs(Ko[:-tail].std() - Kr[:-tail].std()) < 0.02
        else:
            assert abs(Ko.std() - Kr.std()) < 0.02

    # both inits approximate the same centered sphere; the finite-width
    # approximation is rough (the reference's own |error| max is ~0.23, mean
    # ~0.05 at this width), so compare the error DISTRIBUTIONS
    rng = np.random.RandomState(7)
    pts = rng.uniform(-0.6, 0.6, (1, 1024, 3)).astype(np.float32)
    lat = np.zeros((1, a.proj_latent_dim), np.float32)
    target = np.linalg.norm(pts[0], axis=-1) - a.init_sphere_radius
    sdf_o = np.asarray(ours.apply({"params": p}, jnp.asarray(pts),
                                  jnp.asarray(lat)))[0, :, 0]
    sdf_r = ref.forward(_t(pts).reshape(-1, 3),
                        _t(lat).repeat(1024, 1)).detach().numpy()[:, 0]
    # single-seed mean error is high-variance in BOTH frameworks (measured
    # ref means over 5 torch seeds: -0.07..+0.18) — bound each framework's
    # error rather than comparing single draws
    err_o, err_r = sdf_o - target, sdf_r - target
    for err in (err_o, err_r):
        assert np.abs(err).max() < 0.5
        assert abs(err.mean()) < 0.25
        assert err.std() < 0.2


# ---------------------------------------------------------------------------
# full renderer forward (training=False is deterministic in both frameworks)
# ---------------------------------------------------------------------------

def test_renderer_forward_parity(opt, sdf_pair, rgb_pair):
    ref_sdf, our_sdf, sdf_params = sdf_pair
    ref_rgb, our_rgb, rgb_params = rgb_pair
    ref_rend = ref_renderer_mod.Renderer(opt, ref_sdf, ref_rgb)

    rng = np.random.RandomState(5)
    B = 2
    azim = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
    R = ref_camera.azim_to_rotation_matrix(_t(azim), "rad").numpy()
    t = np.tile(np.array([0.0, 0.0, opt.camera.dist], np.float32), (B, 1))
    pose = np.concatenate([R, t[:, :, None]], axis=-1).astype(np.float32)
    scale_focal = (1.0 + 0.1 * rng.randn(B)).astype(np.float32)
    intr = _n(our_camera.get_intr(opt, jnp.asarray(scale_focal)))
    scale_dist = (1.0 + 0.05 * rng.randn(B)).astype(np.float32)
    lat_sdf = rng.randn(B, opt.arch.impl_sdf.proj_latent_dim).astype(np.float32)
    lat_rgb = rng.randn(B, opt.arch.impl_rgb.proj_latent_dim).astype(np.float32)

    rgb_r, mask_r, hard_r, depth_r, normal_r, grad_eik_r = ref_rend.forward(
        opt, _t(pose), _t(intr), _t(scale_dist), _t(lat_sdf), _t(lat_rgb),
        ray_idx=None, training=False)
    assert grad_eik_r is None

    params = {"sdf_network": sdf_params, "rgb_network": rgb_params,
              "density": {"beta": jnp.asarray(
                  float(opt.arch.impl_sdf.beta_init))}}
    out = our_renderer.render(
        opt, our_sdf.apply, our_rgb.apply, params, jnp.asarray(pose),
        jnp.asarray(intr), jnp.asarray(scale_dist), jnp.asarray(lat_sdf),
        jnp.asarray(lat_rgb), ray_idx=None, rng=None, training=False)
    assert out.grad_eikonal is None
    _close(out.rgb, rgb_r.detach().numpy())
    _close(out.mask, mask_r.detach().numpy())
    _close(out.mask_hard, hard_r.detach().numpy())
    _close(out.depth, depth_r.detach().numpy())
    _close(out.normal, normal_r.detach().numpy(), atol=3e-5)


def test_volume_rendering_parity(opt, sdf_pair, rgb_pair):
    """volume_rendering weights/alpha on random z_vals + sdf (reference
    `model/renderer.py:187-209`)."""
    ref_rend = ref_renderer_mod.Renderer(opt, sdf_pair[0], rgb_pair[0])
    rng = np.random.RandomState(6)
    BR, S = 24, opt.render.n_samples_uniform
    z = np.sort(rng.uniform(0.3, 1.7, (BR, S)).astype(np.float32), axis=-1)
    sdf = (rng.randn(BR * S, 1) * 0.2).astype(np.float32)

    w_r, a_r = ref_rend.volume_rendering(_t(z), _t(sdf))

    beta = jnp.asarray(float(opt.arch.impl_sdf.beta_init))
    density = our_implicit.laplace_density(
        jnp.asarray(sdf).reshape(1, BR, S), beta)
    w_o, a_o = our_renderer.volume_rendering(
        jnp.asarray(z).reshape(1, BR, S), density)
    _close(w_o[0], w_r.detach().numpy())
    _close(a_o[0], a_r.detach().numpy())


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_loss(opt):
    return ref_loss_mod.Loss(opt)


def test_basic_losses_parity(ref_loss):
    rng = np.random.RandomState(8)
    pred = rng.rand(3, 20, 3).astype(np.float32)
    label = rng.rand(3, 20, 3).astype(np.float32)
    w = rng.rand(3, 1, 1).astype(np.float32)

    _close(L.l1_loss(jnp.asarray(pred), jnp.asarray(label)),
           ref_loss.L1_loss(_t(pred), _t(label)).numpy())
    _close(L.mse_loss(jnp.asarray(pred), jnp.asarray(label),
                      weight=jnp.asarray(w)),
           ref_loss.MSE_loss(_t(pred), _t(label), weight=_t(w)).numpy())
    # robust-tolerance MSE (sort + drop worst fraction)
    _close(L.mse_loss(jnp.asarray(pred), jnp.asarray(label), tolerance=0.2),
           ref_loss.MSE_loss(_t(pred), _t(label), tolerance=0.2).numpy())

    logits = rng.randn(6, 4).astype(np.float32)
    labels = rng.randint(0, 4, 6)
    _close(L.ce_loss(jnp.asarray(logits), jnp.asarray(labels)),
           ref_loss.CE_loss(_t(logits), torch.from_numpy(labels)).numpy())


def test_iou_and_mask_loss_parity(opt, ref_loss):
    rng = np.random.RandomState(9)
    pred = rng.rand(3, 30, 1).astype(np.float32)
    target = (rng.rand(3, 30, 1) > 0.5).astype(np.float32)
    w = rng.rand(3, 1, 1).astype(np.float32)

    _close(L.iou_loss(jnp.asarray(pred), jnp.asarray(target),
                      weight=jnp.asarray(w)),
           ref_loss.iou_loss(_t(pred), _t(target), weight=_t(w)).numpy())
    # outlier-replacement tolerance path
    _close(L.iou_loss(jnp.asarray(pred), jnp.asarray(target), tolerance=0.15),
           ref_loss.iou_loss(_t(pred), _t(target), tolerance=0.15).numpy())
    _close(L.mask_loss(jnp.asarray(pred), jnp.asarray(target),
                       mask_mse=opt.reg.mask_mse, weight=jnp.asarray(w)),
           ref_loss.mask_loss(_t(pred), _t(target), weight=_t(w)).numpy())


def test_normal_loss_parity_including_kept_set(opt, ref_loss):
    """Robust normal trim: the RANK-based static-shape selection must keep
    exactly the reference's sorted-gather set (reference
    `model/loss.py:52-67`)."""
    rng = np.random.RandomState(10)
    B, R = 3, 40
    npred = rng.randn(B, R, 3).astype(np.float32)
    npred /= np.linalg.norm(npred, axis=-1, keepdims=True)
    ngt = rng.randn(B, R, 3).astype(np.float32)
    ngt /= np.linalg.norm(ngt, axis=-1, keepdims=True)
    mask = rng.rand(B, R, 1) > 0.3
    w = rng.rand(B, 1, 1).astype(np.float32)

    for tol in (0.0, 0.25):
        ref_val = ref_loss.normal_loss(
            _t(npred), _t(ngt), torch.from_numpy(mask), weight=_t(w),
            tolerance=tol).numpy()
        our_val = L.normal_loss(jnp.asarray(npred), jnp.asarray(ngt),
                                jnp.asarray(mask), normal_l1=opt.reg.normal_l1,
                                weight=jnp.asarray(w), tolerance=tol)
        _close(our_val, ref_val)


def test_cam_losses_parity(opt, ref_loss):
    rng = np.random.RandomState(11)
    B = 8
    ang = rng.uniform(-np.pi, np.pi, (3, B)).astype(np.float32)
    trig = [np.stack([np.cos(a), np.sin(a)], -1).astype(np.float32)
            for a in ang]

    # cam_margin_loss
    var = edict(trig_elev=_t(trig[1]), trig_theta=_t(trig[2]))
    _close(L.cam_margin_loss(opt, jnp.asarray(trig[1]), jnp.asarray(trig[2])),
           ref_loss.cam_margin_loss(opt, var).numpy())

    # cam_sym_loss — drive the reference with a stub estimator returning
    # fixed flipped trig predictions
    ang_f = rng.uniform(-np.pi, np.pi, (3, B)).astype(np.float32)
    trig_f = [np.stack([np.cos(a), np.sin(a)], -1).astype(np.float32)
              for a in ang_f]
    var = edict(trig_azim=_t(trig[0]), trig_elev=_t(trig[1]),
                trig_theta=_t(trig[2]),
                rgb_input_map=torch.zeros(B, 3, 4, 4))
    stub = lambda img: (_t(trig_f[0]), _t(trig_f[1]), _t(trig_f[2]),  # noqa
                        None, None)
    ref_val = ref_loss.cam_sym_loss(opt, var, stub).numpy()
    our_val = L.cam_sym_loss(
        tuple(jnp.asarray(t) for t in trig),
        tuple(jnp.asarray(t) for t in trig_f))
    _close(our_val, ref_val)

    # cam_uniform_loss, both Wasserstein orders
    for p in (1, 2):
        o = opt.deepcopy()
        o.reg.emd_p = p
        ref_l = ref_loss_mod.Loss(o)
        _close(L.cam_uniform_loss(jnp.asarray(trig[0]), emd_p=p),
               ref_l.cam_uniform_loss(o, _t(trig[0])).numpy(), atol=2e-5)


def test_category_reg_loss_parity(ref_loss):
    rng = np.random.RandomState(12)
    codes = rng.randn(6, 64).astype(np.float32)
    centers = rng.randn(9, 64).astype(np.float32)
    labels = rng.randint(0, 9, 6)
    var = edict(proj_latent_sdf=_t(codes),
                category_label=torch.from_numpy(labels))
    _close(L.category_reg_loss(jnp.asarray(codes), jnp.asarray(centers),
                               jnp.asarray(labels)),
           ref_loss.category_reg_loss(None, var, _t(centers)).numpy())


# ---------------------------------------------------------------------------
# camera math
# ---------------------------------------------------------------------------

def test_pose_algebra_parity():
    rng = np.random.RandomState(13)
    azim = rng.uniform(-np.pi, np.pi, 4).astype(np.float32)
    elev = rng.uniform(-1.0, 1.0, 4).astype(np.float32)
    roll = rng.uniform(-1.0, 1.0, 4).astype(np.float32)

    for ours, refs, ang in (
            (our_camera.azim_to_rotation_matrix,
             ref_camera.azim_to_rotation_matrix, azim),
            (our_camera.elev_to_rotation_matrix,
             ref_camera.elev_to_rotation_matrix, elev),
            (our_camera.roll_to_rotation_matrix,
             ref_camera.roll_to_rotation_matrix, roll)):
        _close(ours(jnp.asarray(ang), "rad"), refs(_t(ang), "rad").numpy())
        trig = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
        _close(ours(jnp.asarray(trig), "trig"), refs(_t(trig), "trig").numpy())

    R = ref_camera.azim_to_rotation_matrix(_t(azim), "rad").numpy()
    t = rng.randn(4, 3).astype(np.float32)
    pose_r = ref_camera.pose(R=_t(R), t=_t(t))
    pose_o = our_camera.pose(R=R, t=t)
    _close(pose_o, pose_r.numpy())

    # invert / compose round-trips
    _close(our_camera.invert_pose(pose_o),
           ref_camera.pose.invert(pose_r).numpy())
    pose2_r = ref_camera.pose(t=_t(np.array([0, 0, 2.0], np.float32)))
    pose2_o = our_camera.pose(t=np.array([0, 0, 2.0], np.float32))
    pose2_r = pose2_r[None].expand(4, -1, -1)
    _close(our_camera.compose([pose_o, jnp.broadcast_to(pose2_o, (4, 3, 4))]),
           ref_camera.pose.compose([pose_r, pose2_r]).numpy())

    # hom transforms
    X = rng.randn(4, 10, 3).astype(np.float32)
    _close(our_camera.world2cam(jnp.asarray(X), pose_o),
           ref_camera.world2cam(_t(X), pose_r).numpy())
    _close(our_camera.cam2world(jnp.asarray(X), pose_o),
           ref_camera.cam2world(_t(X), pose_r).numpy(), atol=2e-5)
    _close(our_camera.transform_normal(jnp.asarray(X), pose_o),
           ref_camera.transform_normal(_t(X), pose_r).numpy(), atol=2e-5)


def test_ray_generation_parity(opt):
    """Dense rays AND the sparse ray_idx path vs the reference's dense-grid
    + gather (reference `model/renderer.py:63-68`, `utils/camera.py:157-196`)."""
    rng = np.random.RandomState(14)
    B = 2
    azim = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
    R = ref_camera.azim_to_rotation_matrix(_t(azim), "rad").numpy()
    t = np.tile(np.array([0.0, 0.0, opt.camera.dist], np.float32), (B, 1))
    pose = np.concatenate([R, t[:, :, None]], -1).astype(np.float32)
    intr = _n(our_camera.get_intr(opt, jnp.ones(B)))
    _close(intr, ref_camera.get_intr(opt, torch.ones(B)).numpy())

    center_r, ray_r = ref_camera.get_center_and_ray(
        opt, _t(pose), intr=_t(intr), device="cpu")
    center_o, ray_o = our_camera.get_center_and_ray(
        opt, jnp.asarray(pose), intr=jnp.asarray(intr))
    _close(center_o, center_r.numpy(), atol=2e-5)
    _close(ray_o, ray_r.numpy(), atol=2e-5)

    # sparse path == reference gather
    HW = opt.H * opt.W
    ray_idx = np.stack([rng.choice(HW, 6, replace=False) for _ in range(B)])
    gather_idx = torch.from_numpy(ray_idx)[..., None].repeat(1, 1, 3)
    ray_ref_sparse = ray_r.gather(dim=1, index=gather_idx).numpy()
    _, ray_o_sparse = our_camera.get_center_and_ray(
        opt, jnp.asarray(pose), intr=jnp.asarray(intr),
        ray_idx=jnp.asarray(ray_idx))
    _close(ray_o_sparse, ray_ref_sparse, atol=2e-5)
