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


# ---------------------------------------------------------------------------
# torchvision-blocked surface: reference model/graph.py, view_estimator.py,
# pretrainer.py import torchvision at module level; only the pretrained
# backbone CONSTRUCTOR is touched at class init, so a sys.modules stub makes
# the rest of the module importable and testable.
# ---------------------------------------------------------------------------

import types  # noqa: E402


class _StubBackbone(torch.nn.Module):
    """Stands in for torchvision resnet: passes features straight through
    (the reference replaces .fc anyway; our tests drive heads directly)."""

    def __init__(self, in_features=512):
        super().__init__()
        self.fc = torch.nn.Linear(in_features, 1000)

    def forward(self, x):
        return x


def _install_torchvision_stub():
    # vigra is only used by the reference's distance-transform sampler,
    # never by the modules under test here
    sys.modules.setdefault("vigra", types.ModuleType("vigra"))
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]
    tv = types.ModuleType("torchvision")
    tv.models = types.SimpleNamespace(
        resnet18=lambda pretrained=False, **k: _StubBackbone(),
        resnet34=lambda pretrained=False, **k: _StubBackbone(),
    )
    sys.modules["torchvision"] = tv
    return tv


_install_torchvision_stub()
import model.graph as ref_graph_mod            # noqa: E402
import model.view_estimator as ref_est_mod     # noqa: E402
import model.pretrainer as ref_pretrainer_mod  # noqa: E402

from shapeclipper_tpu.models import graph as our_graph_mod   # noqa: E402
from shapeclipper_tpu.models import layers as our_layers     # noqa: E402
from shapeclipper_tpu.models.estimator import (              # noqa: E402
    Estimator as OurEstimator, reset_scale_params)


def _bottleneck_params(ref_block):
    """torch Bottleneck_Linear state -> our BottleneckLinear param/stats."""
    def bn(m):
        return ({"scale": jnp.asarray(m.weight.detach().numpy()),
                 "bias": jnp.asarray(m.bias.detach().numpy())},
                {"mean": jnp.asarray(m.running_mean.detach().numpy()),
                 "var": jnp.asarray(m.running_var.detach().numpy())})
    bn1_p, bn1_s = bn(ref_block.bn1)
    bn2_p, bn2_s = bn(ref_block.bn2)
    params = {
        "linear1": {"kernel": jnp.asarray(
            ref_block.linear1.weight.detach().numpy()[:, :, 0, 0].T)},
        "bn1": bn1_p,
        "linear2": {"kernel": jnp.asarray(
            ref_block.linear2.weight.detach().numpy()[:, :, 0, 0].T)},
        "bn2": bn2_p,
    }
    stats = {"bn1": bn1_s, "bn2": bn2_s}
    return params, stats


def test_bottleneck_linear_parity():
    """Bottleneck_Linear (reference `model/graph.py:16-40` and the zero-init
    estimator variant `model/view_estimator.py:6-33`) vs our BottleneckLinear,
    train-mode (batch stats) and eval-mode (running stats)."""
    rng = np.random.RandomState(20)
    C, B = 16, 6
    x = rng.randn(B, C).astype(np.float32) * 2.0

    for variant, zero_init in ((ref_graph_mod.Bottleneck_Linear(C), False),
                               (ref_est_mod.Bottleneck_Linear(C), True)):
        torch.manual_seed(3)
        ref = variant
        # randomize BN affine + running stats so eval mode is non-trivial
        with torch.no_grad():
            for m in (ref.bn1, ref.bn2):
                m.weight.copy_(torch.rand(C) + 0.5)
                m.bias.copy_(torch.randn(C) * 0.1)
                m.running_mean.copy_(torch.randn(C) * 0.1)
                m.running_var.copy_(torch.rand(C) + 0.5)
        if zero_init and isinstance(ref, ref_est_mod.Bottleneck_Linear):
            pass  # weight already randomized above; zero_init checked below
        params, stats = _bottleneck_params(ref)
        ours = our_layers.BottleneckLinear(C, zero_init=zero_init)

        ref.eval()
        ref_out = ref(_t(x)).detach().numpy()
        our_out = ours.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), train=False)
        _close(our_out, ref_out)

        ref.train()
        ref_out_t = ref(_t(x)).detach().numpy()
        our_out_t, _ = ours.apply({"params": params, "batch_stats": stats},
                                  jnp.asarray(x), train=True,
                                  mutable=["batch_stats"])
        _close(our_out_t, ref_out_t)

    # fresh-init structural parity: estimator variant starts as identity-ish
    # (bn2 scale zero-initialized in both frameworks)
    ref0 = ref_est_mod.Bottleneck_Linear(C)
    assert float(ref0.bn2.weight.abs().max()) == 0.0
    v = our_layers.BottleneckLinear(C, zero_init=True).init(
        jax.random.PRNGKey(0), jnp.zeros((2, C)), train=False)
    assert float(jnp.abs(v["params"]["bn2"]["scale"]).max()) == 0.0


def test_estimator_heads_parity(opt):
    """Estimator trig/scale head composition (reference
    `model/view_estimator.py:80-103`) on identical weights and features:
    L2-normalized trig pairs, tanh-bounded scales, scale_dist coupling."""
    torch.manual_seed(7)
    ref = ref_est_mod.Estimator(opt)
    ref.feature_extractor = torch.nn.Identity()
    # randomize the heads away from init so the test is non-trivial
    with torch.no_grad():
        ref.extr_fc.weight.copy_(torch.randn(6, 512) * 0.05)
        ref.extr_fc.bias.copy_(torch.randn(6) * 0.2)
        ref.size_fc.weight.copy_(torch.randn(1, 512) * 0.05)
        ref.size_fc.bias.copy_(torch.randn(1) * 0.2)
        ref.perspect_fc.weight.copy_(torch.randn(1, 512) * 0.05)
        ref.perspect_fc.bias.copy_(torch.randn(1) * 0.2)
        for head in (ref.extr_head, ref.size_head, ref.perspect_head):
            blk = head[0]
            for m in (blk.bn1, blk.bn2):
                m.weight.copy_(torch.rand(512) + 0.5)
                m.bias.copy_(torch.randn(512) * 0.1)
                m.running_mean.copy_(torch.randn(512) * 0.1)
                m.running_var.copy_(torch.rand(512) + 0.5)

    params, stats = {}, {}
    for name, head, fc in (("extr", ref.extr_head, ref.extr_fc),
                           ("size", ref.size_head, ref.size_fc),
                           ("perspect", ref.perspect_head, ref.perspect_fc)):
        hp, hs = _bottleneck_params(head[0])
        params[f"{name}_head"] = hp
        stats[f"{name}_head"] = hs
        params[f"{name}_fc"] = {
            "kernel": jnp.asarray(fc.weight.detach().numpy().T),
            "bias": jnp.asarray(fc.bias.detach().numpy())}
    ours = OurEstimator.from_opt(opt)

    rng = np.random.RandomState(21)
    feat = rng.randn(5, 512).astype(np.float32)

    ref.eval()
    a_r, e_r, t_r, sf_r, sd_r = ref.forward(_t(feat))
    out = ours.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(feat), train=False, method="heads")
    _close(out.trig_azim, a_r.detach().numpy())
    _close(out.trig_elev, e_r.detach().numpy())
    _close(out.trig_theta, t_r.detach().numpy())
    _close(out.scale_focal, sf_r.detach().numpy())
    _close(out.scale_dist, sd_r.detach().numpy())

    ref.train()
    a_r, e_r, t_r, sf_r, sd_r = ref.forward(_t(feat))
    out_t, _ = ours.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(feat), train=True, method="heads",
                          mutable=["batch_stats"])
    _close(out_t.trig_azim, a_r.detach().numpy())
    _close(out_t.scale_dist, sd_r.detach().numpy(), atol=2e-5)


def test_estimator_init_and_reset_parity(opt):
    """Fresh-init head structure (elev/theta forced to (1,0), scales exactly
    1, reference `model/view_estimator.py:58-70`) and reset_scales
    (`:72-77`)."""
    ref = ref_est_mod.Estimator(opt)
    w = ref.extr_fc.weight.detach().numpy()      # [6, 512]
    b = ref.extr_fc.bias.detach().numpy()
    assert np.all(w[2:] == 0.0)
    np.testing.assert_allclose(b[2:], [1.0, 0.0, 1.0, 0.0])
    assert float(np.abs(ref.size_fc.weight.detach().numpy()).max()) == 0.0

    ours = OurEstimator.from_opt(opt)
    v = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                  train=False)
    p = v["params"]
    ko = np.asarray(p["extr_fc"]["kernel"])      # [512, 6]
    bo = np.asarray(p["extr_fc"]["bias"])
    assert np.all(ko[:, 2:] == 0.0)
    np.testing.assert_allclose(bo, [0.0, 0.0, 1.0, 0.0, 1.0, 0.0])
    for head in ("size_fc", "perspect_fc"):
        assert float(np.abs(np.asarray(p[head]["kernel"])).max()) == 0.0
        assert float(np.abs(np.asarray(p[head]["bias"])).max()) == 0.0

    # reset_scale_params zeroes the scale fcs again after training moved them
    moved = jax.tree_util.tree_map(lambda x: x + 1.0, p)
    reset = reset_scale_params(moved)
    for head in ("size_fc", "perspect_fc"):
        assert float(jnp.abs(reset[head]["kernel"]).max()) == 0.0
    assert float(jnp.abs(reset["extr_fc"]["kernel"]).max()) > 0.0

    # init implies scales exactly 1 through the forward
    feat = np.random.RandomState(22).randn(3, 512).astype(np.float32)
    out = ours.apply({"params": p, "batch_stats": v["batch_stats"]},
                     jnp.asarray(feat), train=False, method="heads")
    np.testing.assert_allclose(np.asarray(out.scale_dist), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.scale_focal), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.trig_elev),
                               np.tile([1.0, 0.0], (3, 1)), atol=1e-6)


def test_pred_pose_composition_parity(opt):
    """pred_pose rotation/translation composition (reference
    `model/graph.py:267-293`): Rz·Rx·Ry·R_permute + z-translation, identical
    trig inputs -> identical pose and intrinsics."""
    rng = np.random.RandomState(23)
    B = 4
    ang = rng.uniform(-np.pi, np.pi, (3, B)).astype(np.float32)
    trig = [np.stack([np.cos(a), np.sin(a)], -1).astype(np.float32)
            for a in ang]
    scale_focal = (1.0 + 0.1 * rng.randn(B)).astype(np.float32)
    scale_dist = (1.0 + 0.05 * rng.randn(B)).astype(np.float32)

    stub_self = types.SimpleNamespace(
        estimator=lambda img: (_t(trig[0]), _t(trig[1]), _t(trig[2]),
                               _t(scale_focal), _t(scale_dist)))
    var = edict(rgb_input_map=torch.zeros(B, 3, 4, 4))
    pose_r, intr_r, sd_r = ref_graph_mod.Graph.pred_pose(
        stub_self, opt, var)
    # reference stores the raw estimator outputs on var as a side effect
    _close(var.trig_azim, trig[0])

    pose_o, intr_o = our_graph_mod.pose_from_trig(
        opt, jnp.asarray(trig[0]), jnp.asarray(trig[1]), jnp.asarray(trig[2]),
        jnp.asarray(scale_focal), jnp.asarray(scale_dist))
    _close(pose_o, pose_r.detach().numpy(), atol=2e-5)
    _close(intr_o, intr_r.detach().numpy())
    _close(jnp.asarray(scale_dist), sd_r.detach().numpy())


def test_forward_nn_selection_and_gather_parity(opt, monkeypatch):
    """forward_NN neighbor selection + gather semantics (reference
    `model/graph.py:114-218`): IoU-derived sampling probabilities match, and
    with FORCED identical indices the gathered per-view inputs match across
    the [..., K] (reference) vs [B, K, ...] (ours) layouts."""
    o = opt.deepcopy()
    B, K, V, N, H, W = 3, 4, 2, 12, 4, 4
    o.H = o.W = H
    o.data.k_nearest = K
    o.reg.n_views = V
    o.reg.sample_temp = 2
    o.render.rand_sample = N
    rng = np.random.RandomState(24)

    rgb = rng.rand(B, N, 3).astype(np.float32)
    mask = (rng.rand(B, N, 1) > 0.4).astype(np.float32)
    normal = rng.randn(B, N, 3).astype(np.float32)
    rgb_map = rng.rand(B, H, W, 3).astype(np.float32)
    mask_map = (rng.rand(B, 1, H, W) > 0.4).astype(np.float32)
    normal_map = rng.randn(B, 3, H, W).astype(np.float32)
    pose_gt = rng.randn(B, 3, 4).astype(np.float32)
    ray_idx = rng.randint(0, H * W, (B, N)).astype(np.int64)
    rgb_NN = rng.rand(B, K, N, 3).astype(np.float32)
    mask_NN = (rng.rand(B, K, N, 1) > 0.4).astype(np.float32)
    normal_NN = rng.randn(B, K, N, 3).astype(np.float32)
    rgb_map_NN = rng.rand(B, K, H, W, 3).astype(np.float32)
    mask_map_NN = (rng.rand(B, K, 1, H, W) > 0.4).astype(np.float32)
    normal_map_NN = rng.randn(B, K, 3, H, W).astype(np.float32)
    pose_gt_NN = rng.randn(B, K, 3, 4).astype(np.float32)
    ray_idx_NN = rng.randint(0, H * W, (B, K, N)).astype(np.int64)

    forced_idx = np.array([[2, 0], [1, 3], [0, 2]])

    # ---- reference: stub the heavy members, capture probs + gathers -------
    captured_probs = []

    def fake_choice(k, size, replace, p):
        captured_probs.append(np.array(p))
        return forced_idx[len(captured_probs) - 1]

    monkeypatch.setattr(ref_graph_mod.np.random, "choice", fake_choice)

    latent_dim = o.arch.latent_dim_shape + o.arch.latent_dim_rgb
    stub_self = types.SimpleNamespace(
        encoder=lambda img: torch.zeros(img.shape[0], latent_dim),
        latent_proj_rgb=lambda x: x,
        pred_pose=lambda *a, **k: (torch.zeros(B, 3, 4), torch.zeros(B, 3, 3),
                                   torch.ones(B)),
        renderer=lambda *a, **k: tuple(torch.zeros(B, N, 1)
                                       for _ in range(6)),
    )
    # reference layout: NN stacks carry K on the LAST axis
    var_r = edict(
        idx=torch.arange(B),
        proj_latent_sdf=torch.zeros(B, o.arch.impl_sdf.proj_latent_dim),
        rgb_input=_t(rgb), mask_input=_t(mask), normal_input=_t(normal),
        rgb_input_map=_t(np.moveaxis(rgb_map, -1, 1)),
        mask_input_map=_t(mask_map), normal_input_map=_t(normal_map),
        pose_gt=_t(pose_gt), ray_idx=torch.from_numpy(ray_idx),
        rgb_input_NN=_t(np.moveaxis(rgb_NN, 1, -1)),
        mask_input_NN=_t(np.moveaxis(mask_NN, 1, -1)),
        normal_input_NN=_t(np.moveaxis(normal_NN, 1, -1)),
        rgb_input_map_NN=_t(np.moveaxis(np.moveaxis(rgb_map_NN, -1, 2), 1, -1)),
        mask_input_map_NN=_t(np.moveaxis(mask_map_NN, 1, -1)),
        normal_input_map_NN=_t(np.moveaxis(normal_map_NN, 1, -1)),
        pose_gt_NN=_t(np.moveaxis(pose_gt_NN, 1, -1)),
        ray_idx_NN=torch.from_numpy(np.moveaxis(ray_idx_NN, 1, -1)),
    )
    ref_graph_mod.Graph.forward_NN(stub_self, o, var_r, training=True)
    assert len(captured_probs) == B

    # ---- ours: force the same indices through the top_k hook --------------
    g = our_graph_mod.Graph(o)
    var_o = edict(
        rgb_input=jnp.asarray(rgb), mask_input=jnp.asarray(mask),
        normal_input=jnp.asarray(normal),
        rgb_input_map=jnp.asarray(rgb_map),
        mask_input_map=jnp.asarray(np.moveaxis(mask_map, 1, -1)),
        normal_input_map=jnp.asarray(np.moveaxis(normal_map, 1, -1)),
        pose_gt=jnp.asarray(pose_gt), ray_idx=jnp.asarray(ray_idx),
        rgb_input_NN=jnp.asarray(rgb_NN), mask_input_NN=jnp.asarray(mask_NN),
        normal_input_NN=jnp.asarray(normal_NN),
        rgb_input_map_NN=jnp.asarray(rgb_map_NN),
        mask_input_map_NN=jnp.asarray(np.moveaxis(mask_map_NN, 2, -1)),
        normal_input_map_NN=jnp.asarray(np.moveaxis(normal_map_NN, 2, -1)),
        pose_gt_NN=jnp.asarray(pose_gt_NN),
        ray_idx_NN=jnp.asarray(ray_idx_NN),
    )
    monkeypatch.setattr(
        our_graph_mod.jax.lax, "top_k",
        lambda x, k: (None, jnp.asarray(forced_idx)))
    sels = g._nn_select(var_o, jax.random.PRNGKey(0), training=True)

    # selection probabilities match the reference's np.random.choice p
    our_scores = np.asarray(var_o.nn_scores)
    our_probs = our_scores / our_scores.sum(-1, keepdims=True)
    _close(our_probs, np.stack(captured_probs), atol=1e-6)

    # gathered per-view inputs match (modulo layout)
    for v in range(V):
        sel_r = var_r[f"input_NN_{v}"]
        sel_o = sels[v]
        _close(sel_o.rgb_input, sel_r.rgb_input.numpy())
        _close(sel_o.mask_input, sel_r.mask_input.numpy())
        _close(sel_o.normal_input, sel_r.normal_input.numpy())
        _close(np.moveaxis(np.asarray(sel_o.rgb_input_map), -1, 1),
               sel_r.rgb_input_map.numpy())
        _close(np.moveaxis(np.asarray(sel_o.mask_input_map), -1, 1),
               sel_r.mask_input_map.numpy())
        _close(np.moveaxis(np.asarray(sel_o.normal_input_map), -1, 1),
               sel_r.normal_input_map.numpy())
        _close(sel_o.pose_gt, sel_r.pose_gt.numpy())
        np.testing.assert_array_equal(np.asarray(sel_o.ray_idx),
                                      sel_r.ray_idx.numpy())


def test_pretrain_sphere_loss_parity(opt, sdf_pair, monkeypatch):
    """Pretrain sphere-SDF loss (reference `model/pretrainer.py:174-181`):
    MSE(sdf(x), ||x|| - radius) on identical points/latents/weights."""
    ref_sdf, our_sdf, sdf_params = sdf_pair
    o = opt.deepcopy()
    o.batch_size = 2
    P = int(o.pre.sample_points) if "sample_points" in o.pre else 64
    o.pre.sample_points = min(P, 64)
    rng = np.random.RandomState(25)
    raw = rng.rand(o.batch_size * o.pre.sample_points, 3).astype(np.float32)
    lat = rng.randn(o.batch_size,
                    o.arch.impl_sdf.proj_latent_dim).astype(np.float32)

    # reference draws torch.rand in [0,1) then affine-scales
    monkeypatch.setattr(ref_pretrainer_mod.torch, "rand",
                        lambda *s, **k: torch.from_numpy(raw))
    ref_loss_obj = ref_loss_mod.Loss(o)
    stub_self = types.SimpleNamespace(sdf_network=ref_sdf,
                                      loss_fns=ref_loss_obj)
    ref_val = ref_pretrainer_mod.Graph.get_sdf_loss(
        stub_self, o, "cpu", _t(lat)).detach().numpy()

    # ours draws jax.random.uniform(minval, maxval) — intercept with the
    # same raw points
    from shapeclipper_tpu.models import pretrain_graph as our_pre_mod

    def fake_uniform(key, shape, dtype=jnp.float32, minval=0.0, maxval=1.0):
        return jnp.asarray(raw.reshape(shape)) * (maxval - minval) + minval

    monkeypatch.setattr(our_pre_mod.jax.random, "uniform", fake_uniform)
    g = our_pre_mod.PretrainGraph(o)
    our_val = g.get_sdf_loss({"sdf_network": sdf_params},
                             jax.random.PRNGKey(0), jnp.asarray(lat))
    _close(our_val, ref_val)


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
