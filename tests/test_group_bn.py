"""GroupBatchNorm: the mechanism behind the one-call query+flip+NN encoder
merge (tpu.merge_encoders / merge_flip_estimator). The contract: a grouped
call on the [G*B] concat is numerically EQUAL to G separate nn.BatchNorm
calls — per-group normalization and sequential running-stats EMA included."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapeclipper_tpu.models.layers import GroupBatchNorm


def _bn_pair(use_running_average, dtype=None):
    gbn = GroupBatchNorm(use_running_average=use_running_average,
                         momentum=0.9, epsilon=1e-5, dtype=dtype)
    ref = nn.BatchNorm(use_running_average=use_running_average,
                       momentum=0.9, epsilon=1e-5, dtype=dtype)
    return gbn, ref


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
@pytest.mark.parametrize("train", [True, False])
def test_groups1_matches_flax_batchnorm(dtype, train):
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 5, 5, 8))
    if dtype is not None:
        x = x.astype(dtype)
    gbn, ref = _bn_pair(use_running_average=not train, dtype=dtype)
    v_ref = ref.init(jax.random.PRNGKey(1), x)
    # same variable names/shapes -> same pytree; perturb so it's non-trivial
    v = jax.tree_util.tree_map(lambda a: a, v_ref)
    v["params"]["scale"] = v["params"]["scale"] * 1.3 + 0.1
    v["params"]["bias"] = v["params"]["bias"] + 0.05
    v["batch_stats"]["mean"] = v["batch_stats"]["mean"] + 0.2
    v["batch_stats"]["var"] = v["batch_stats"]["var"] * 1.7

    if train:
        y_ref, m_ref = ref.apply(v, x, mutable=["batch_stats"])
        y, m = gbn.apply(v, x, mutable=["batch_stats"])
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(m["batch_stats"][k]),
                np.asarray(m_ref["batch_stats"][k]), rtol=1e-6, atol=1e-7)
    else:
        y_ref = ref.apply(v, x)
        y = gbn.apply(v, x)
    assert y.dtype == y_ref.dtype
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=1e-6, atol=1e-6)


def test_grouped_equals_separate_calls():
    """groups=G on the concat == G separate BatchNorm calls: identical
    per-group outputs AND identical sequentially-composed running stats."""
    G, B, C = 3, 4, 16
    xs = [jax.random.normal(jax.random.PRNGKey(i), (B, C)) + i
          for i in range(G)]
    gbn = GroupBatchNorm(use_running_average=False, groups=G)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = ref.init(jax.random.PRNGKey(9), xs[0])
    v["params"]["scale"] = v["params"]["scale"] * 0.7 + 0.2
    v["batch_stats"]["mean"] = v["batch_stats"]["mean"] - 0.3

    y, m = gbn.apply(v, jnp.concatenate(xs), mutable=["batch_stats"])

    stats = v["batch_stats"]
    for g in range(G):
        y_g, m_g = ref.apply({"params": v["params"], "batch_stats": stats},
                             xs[g], mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y[g * B:(g + 1) * B]),
                                   np.asarray(y_g), rtol=1e-6, atol=1e-6)
        stats = m_g["batch_stats"]  # sequential EMA, like separate calls
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(m["batch_stats"][k]),
                                   np.asarray(stats[k]), rtol=1e-6, atol=1e-7)


def test_stats_groups_mask():
    """stats_groups=(0, 2): group 1's running-stats update is discarded (the
    flip-pass semantics) but its normalization still uses its own moments."""
    G, B, C = 3, 4, 8
    xs = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, C)) * (1 + i)
          for i in range(G)]
    gbn = GroupBatchNorm(use_running_average=False, groups=G,
                         stats_groups=(0, 2))
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = ref.init(jax.random.PRNGKey(11), xs[0])

    y, m = gbn.apply(v, jnp.concatenate(xs), mutable=["batch_stats"])

    stats = v["batch_stats"]
    for g in (0, 2):  # only these update, in order
        _, m_g = ref.apply({"params": v["params"], "batch_stats": stats},
                           xs[g], mutable=["batch_stats"])
        stats = m_g["batch_stats"]
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(m["batch_stats"][k]),
                                   np.asarray(stats[k]), rtol=1e-6, atol=1e-7)
    # group 1 normalized by its own moments (not group 0's / running):
    y1_sep = ref.apply(v, xs[1], mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y[B:2 * B]), np.asarray(y1_sep),
                               rtol=1e-6, atol=1e-6)


def test_eval_mode_ignores_groups():
    x = jax.random.normal(jax.random.PRNGKey(2), (12, 8))
    v = nn.BatchNorm(use_running_average=True).init(jax.random.PRNGKey(3), x)
    v["batch_stats"]["mean"] = v["batch_stats"]["mean"] + 0.5
    y1 = GroupBatchNorm(use_running_average=True, groups=3).apply(v, x)
    y2 = GroupBatchNorm(use_running_average=True, groups=1).apply(v, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


# Tolerances for the deep conv chains: with a SINGLE XLA CPU device the
# grouped call is measured BIT-EXACT vs separate calls; the 8-virtual-device
# conftest env lowers batch-6 and batch-2 convs differently (~8e-7 per conv,
# the same intrinsic reassociation pinned in PARITY.md), which the untrained
# BN chains amplify to ~1e-5 at 64x64 inputs. 32x32 inputs are degenerate
# (layer4 at 1x1 spatial = 2 samples per BN moment) — do not shrink them.


def test_resnet_grouped_equals_separate():
    """The full conv backbone: one groups=G ResNet call == G sequential
    calls (outputs and running stats)."""
    from shapeclipper_tpu.models.resnet import resnet18

    G, B = 3, 2
    net = resnet18(num_classes=None)
    xs = [jax.random.uniform(jax.random.PRNGKey(20 + g), (B, 64, 64, 3))
          for g in range(G)]
    v = net.init(jax.random.PRNGKey(21), xs[0], train=False)

    y, m = net.apply(v, jnp.concatenate(xs), train=True, groups=G,
                     mutable=["batch_stats"])

    stats = v["batch_stats"]
    for g in range(G):
        y_g, m_g = net.apply({"params": v["params"], "batch_stats": stats},
                             xs[g], train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y[g * B:(g + 1) * B]),
                                   np.asarray(y_g), rtol=1e-4, atol=1e-4)
        stats = m_g["batch_stats"]
    leaves_m = jax.tree_util.tree_leaves(m["batch_stats"])
    leaves_s = jax.tree_util.tree_leaves(stats)
    for a, b in zip(leaves_m, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_estimator_grouped_equals_separate():
    """One groups=G estimator call (conv + BN1d heads) == G separate calls;
    stats_groups drops the flip group's running-stats update."""
    from shapeclipper_tpu.models.estimator import Estimator

    G, B = 3, 2
    est = Estimator(size_range=0.2, perspect_range=0.0)
    xs = [jax.random.uniform(jax.random.PRNGKey(30 + g), (B, 64, 64, 3))
          for g in range(G)]
    v = est.init(jax.random.PRNGKey(31), xs[0], train=False)

    out, m = est.apply(v, jnp.concatenate(xs), train=True, groups=G,
                       stats_groups=(0, 2), mutable=["batch_stats"])

    stats = v["batch_stats"]
    outs = []
    for g in range(G):
        o_g, m_g = est.apply({"params": v["params"], "batch_stats": stats},
                             xs[g], train=True, mutable=["batch_stats"])
        outs.append(o_g)
        if g != 1:  # the flip group's update is discarded
            stats = m_g["batch_stats"]
    for field in out._fields:
        got = np.asarray(getattr(out, field))
        for g in range(G):
            want = np.asarray(getattr(outs[g], field))
            np.testing.assert_allclose(got[g * B:(g + 1) * B], want,
                                       rtol=1e-4, atol=1e-4, err_msg=field)
    leaves_m = jax.tree_util.tree_leaves(m["batch_stats"])
    leaves_s = jax.tree_util.tree_leaves(stats)
    for a, b in zip(leaves_m, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def test_per_replica_bn_matches_split_forward(base_opt):
    """tpu.bn_mode=per_replica: the sharded-batch encode must equal running
    the GLOBAL-BN graph separately on each shard's rows from the same
    starting running stats (DDP semantics, reference `model/runner.py:121`),
    with the persistent stats following shard 0 (broadcast_buffers)."""
    from shapeclipper_tpu.models.graph import Graph

    opt = base_opt.deepcopy()
    opt.H = opt.W = 16
    opt.tpu.bn_mode = "per_replica"
    opt.tpu.bn_replicas = 2
    g_rep = Graph(opt)
    assert g_rep.bn_replicas == 2
    opt_g = opt.deepcopy()
    opt_g.tpu.bn_mode = "global"
    g_glob = Graph(opt_g)

    state = g_rep.init(jax.random.PRNGKey(0))
    params, stats = state["params"], state["batch_stats"]
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))

    ps, pr, lat, new_stats = g_rep.encode(params, stats, imgs, True, False)
    # per-shard forwards from the SAME incoming stats (DDP broadcast)
    ps0, pr0, lat0, stats0 = g_glob.encode(params, stats, imgs[:2], True,
                                           False)
    ps1, pr1, lat1, _ = g_glob.encode(params, stats, imgs[2:], True, False)

    np.testing.assert_allclose(np.asarray(ps), np.concatenate(
        [np.asarray(ps0), np.asarray(ps1)]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lat), np.concatenate(
        [np.asarray(lat0), np.asarray(lat1)]), rtol=2e-5, atol=2e-5)
    # persistent running stats == shard 0's chain
    for a, b in zip(jax.tree_util.tree_leaves(new_stats),
                    jax.tree_util.tree_leaves(stats0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # and differs from the global-BN stats chain (the mode does something)
    _, _, _, stats_glob = g_glob.encode(params, stats, imgs, True, False)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(new_stats),
                             jax.tree_util.tree_leaves(stats_glob))]
    assert max(diffs) > 1e-6
