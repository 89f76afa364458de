"""Decompose the train-step wall time on the current backend."""
import sys, os; sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import time
import jax, jax.numpy as jnp, optax
from shapeclipper_tpu.config import options
from shapeclipper_tpu.data import synthetic
from shapeclipper_tpu.data.base import default_collate
from shapeclipper_tpu.models.graph import Graph, summarize_loss
from shapeclipper_tpu.train.pretrainer import make_optimizer
from shapeclipper_tpu.utils.easydict import EasyDict as edict

opt = options.load_options('options/pix3d/config.yaml')
opt.H, opt.W = opt.image_size
opt.data.update(dataset='synthetic', num_workers=0, max_img_cat=12)
opt.data.synthetic = edict(azim_range=[-180,180], elev_range=[-90,90], theta_range=[-90,90])
opt.seed = 0
graph = Graph(opt)
state = graph.init(jax.random.PRNGKey(0))
params, stats = state['params'], state['batch_stats']
ds = synthetic.Dataset(opt, split='train')
batch = default_collate([ds[i] for i in range(opt.batch_size)])
batch = edict({k: jnp.asarray(v) for k, v in batch.items()})
rng = jax.random.PRNGKey(1)

def bench(name, f, *args):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    jax.block_until_ready(out)
    print(f'{name:35s} {(time.perf_counter()-t0)/10*1000:7.2f} ms')

tx = make_optimizer(opt, params, lambda p: True)
opt_state = tx.init(params)
def step(p, s, o, b, r):
    def loss_fn(pp):
        _, loss, ns = graph.forward(pp, s, b, r, training=True)
        return summarize_loss(opt, loss).all, ns
    (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    u, no = tx.update(g, o, p)
    return optax.apply_updates(p, u), ns, no, l
bench('full step (fwd+bwd+adam)', jax.jit(step), params, stats, opt_state, batch, rng)

def fwd(p, s, b, r):
    _, loss, ns = graph.forward(p, s, b, r, training=True)
    return summarize_loss(opt, loss).all
bench('forward only', jax.jit(fwd), params, stats, batch, rng)

o2 = opt.deepcopy(); o2.loss_weight.nearest_img=None; o2.loss_weight.nearest_mask=None; o2.loss_weight.nearest_normal=None
g2 = Graph(o2)
def step2(p, s, b, r):
    def loss_fn(pp):
        _, loss, ns = g2.forward(pp, s, b, r, training=True)
        return summarize_loss(o2, loss).all
    return jax.grad(loss_fn)(p)
bench('fwd+bwd no-NN', jax.jit(step2), params, stats, batch, rng)

import shapeclipper_tpu.camera as camera
pose = camera.pose(R=jnp.broadcast_to(jnp.eye(3),(12,3,3)), t=jnp.broadcast_to(jnp.array([0.,0.,5.]),(12,3)))
intr = camera.get_intr(opt, jnp.ones((12,)))
lat_s = jnp.zeros((12,64)); lat_r = jnp.zeros((12,64))
ray_idx = jax.random.randint(jax.random.PRNGKey(3),(12,512),0,224*224)
def render_loss(p, r):
    out = graph.render(p, pose, intr, jnp.ones((12,)), lat_s, lat_r, ray_idx, r, True)
    return jnp.mean(out.rgb**2)+jnp.mean(out.normal**2)+jnp.mean((out.grad_eikonal-1)**2)
bench('renderer fwd', jax.jit(render_loss), params, rng)
bench('renderer fwd+bwd', jax.jit(lambda p, r: jax.grad(render_loss)(p, r)), params, rng)

def enc_loss(p, b):
    lat, _ = graph._apply_bn(graph.encoder, p['encoder'], stats['encoder'], (b.rgb_input_map,), True, False)
    return jnp.mean(lat**2)
bench('encoder(resnet34) fwd+bwd', jax.jit(lambda p,b: jax.grad(enc_loss)(p,b)), params, batch)

def est_loss(p, b):
    out, _ = graph._apply_bn(graph.estimator, p['estimator'], stats['estimator'], (b.rgb_input_map,), True, False)
    return jnp.mean(out.trig_azim**2) + jnp.mean(out.scale_dist**2)
bench('estimator(resnet18) fwd+bwd', jax.jit(lambda p,b: jax.grad(est_loss)(p,b)), params, batch)
