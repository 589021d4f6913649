import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prosim_tpu.config import get_config
from prosim_tpu.data.synthetic import make_synthetic_batch
from prosim_tpu.models.prosim import ProSim

SMALL_OPTS = [
    "MODEL.SCENE_ENCODER.ATTN.NUM_LAYER", "2",
    "MODEL.DECODER.ATTN.NUM_LAYER", "2",
    "MODEL.POLICY.ACT_DECODER.ATTN.NUM_LAYER", "2",
    "MODEL.HIDDEN_DIM", "32",
    "MODEL.SCENE_ENCODER.ATTN.FF_DIM", "4",
    "MODEL.DECODER.ATTN.FF_DIM", "4",
    "MODEL.POLICY.ACT_DECODER.ATTN.FF_DIM", "4",
    "MODEL.SCENE_ENCODER.ATTN.MAX_NUM_NEIGH", "8",
    "MODEL.DECODER.ATTN.MAX_NUM_NEIGH", "8",
    "MODEL.POLICY.ACT_DECODER.ATTN.MAX_NUM_NEIGH", "8",
]


@pytest.fixture(scope="module")
def ctx():
    cfg = get_config(opts=SMALL_OPTS)
    model = ProSim(cfg)
    batch = make_synthetic_batch(
        cfg, batch_size=2, num_lanes=16, num_obs_agents=10, num_agents=6, num_replan=2
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    fwd = jax.jit(lambda p, b, k: model.forward(p, b, "val", k))
    out = fwd(params, batch, jax.random.PRNGKey(7))
    out2 = fwd(params, batch, jax.random.PRNGKey(7))
    return dict(cfg=cfg, model=model, batch=batch, params=params, fwd=fwd, out=out, out2=out2)


def test_forward_shapes(ctx):
    cfg, batch, out = ctx["cfg"], ctx["batch"], ctx["out"]
    B, N = batch.prompt.mask.shape
    R = batch.fut_obs.feat.shape[1]
    S = cfg.DATASET.FORMAT.TARGET.STEPS
    K = cfg.MODEL.POLICY.ACT_DECODER.TRAJ.K
    state_dim = len(cfg.DATASET.FORMAT.TARGET.ELEMENTS.split(","))

    assert out["motion_pred"].shape == (R, B, N, K, S, state_dim)
    assert out["motion_prob"].shape == (R, B, N, K)
    assert out["rollout_traj"].shape == (B, N, R * cfg.ROLLOUT.POLICY.REPLAN_FREQ, 4)
    mask = np.asarray(batch.prompt.mask)
    rt = np.asarray(out["rollout_traj"])
    assert np.isfinite(rt[mask]).all()
    # (sin, cos) channels stay on the unit circle for valid agents
    sc = rt[mask][..., 2] ** 2 + rt[mask][..., 3] ** 2
    np.testing.assert_allclose(sc, 1.0, atol=1e-4)


def test_jit_deterministic(ctx):
    np.testing.assert_array_equal(
        np.asarray(ctx["out"]["rollout_traj"]), np.asarray(ctx["out2"]["rollout_traj"])
    )


def test_no_teleporting(ctx):
    traj = np.asarray(ctx["out"]["rollout_traj"])
    mask = np.asarray(ctx["batch"].prompt.mask)
    steps = np.diff(traj[..., :2], axis=2)
    assert np.abs(steps[mask]).max() < 100.0


def test_train_mode_grads_flow(ctx):
    model, batch, params = ctx["model"], ctx["batch"], ctx["params"]

    def loss_fn(p):
        out = model.forward(p, batch, "train", jax.random.PRNGKey(0))
        m = batch.prompt.mask[None, :, :, None, None, None]
        return jnp.sum(jnp.where(m, out["motion_pred"], 0.0) ** 2) / 1000.0

    val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(val))
    total = sum(float(x) for x in jax.tree.leaves(jax.tree.map(lambda g: jnp.abs(g).sum(), grads)))
    assert np.isfinite(total) and total > 0


def test_padding_agents_do_not_affect_valid_agents(ctx):
    """Growing the policy-agent axis with masked slots must not change valid
    agents' rollouts (mask-correctness of the whole closed loop)."""
    model, params = ctx["model"], ctx["params"]
    b1 = ctx["batch"]
    out1 = ctx["out"]

    from prosim_tpu.data.batch import Prompt, FutObs

    def pad(x, n, axis):
        pw = [(0, 0)] * x.ndim
        pw[axis] = (0, n)
        return jnp.pad(x, pw)

    p = b1.prompt
    B = p.mask.shape[0]
    prompt2 = Prompt(
        feat=pad(p.feat, 3, 1),
        mask=pad(p.mask, 3, 1),
        pos=pad(p.pos, 3, 1),
        ori=pad(p.ori, 3, 1),
        agent_type=pad(p.agent_type, 3, 1),
        obs_index=jnp.concatenate([p.obs_index, -jnp.ones((B, 3), jnp.int32)], axis=1),
        extent=pad(p.extent, 3, 1),
        goal_point=pad(p.goal_point, 3, 1),
    )
    f = b1.fut_obs
    fut2 = FutObs(
        feat=f.feat, mask=f.mask, pos=f.pos, ori=f.ori,
        obs_index=jnp.concatenate(
            [f.obs_index, -jnp.ones((B, f.obs_index.shape[1], 3), jnp.int32)], axis=2
        ),
    )
    b2 = b1.replace(prompt=prompt2, fut_obs=fut2)
    out2 = model.forward(params, b2, "val", jax.random.PRNGKey(7))

    mask = np.asarray(b1.prompt.mask)
    t1 = np.asarray(out1["rollout_traj"])[mask]
    t2 = np.asarray(out2["rollout_traj"])[:, :6][mask]
    np.testing.assert_allclose(t1, t2, atol=2e-4, rtol=2e-4)


def test_cluster_pred_mode(tmp_path):
    """'cluster' anchors: k-means goal xy -> fixed Fourier PE -> MLP anchors
    (reference: act_decoder.py:69-73,104-106)."""
    K = 4
    goals = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, 0.0], [0.0, -10.0]], np.float32)
    path = str(tmp_path / "k_goals.npy")
    np.save(path, goals)
    cfg = get_config(opts=SMALL_OPTS + [
        "MODEL.POLICY.ACT_DECODER.TRAJ.PRED_MODE", "cluster",
        "MODEL.POLICY.ACT_DECODER.TRAJ.CLUSTER_PATH", path,
        "MODEL.POLICY.ACT_DECODER.TRAJ.K", str(K),
    ])
    model = ProSim(cfg)
    batch = make_synthetic_batch(
        cfg, batch_size=1, num_lanes=16, num_obs_agents=10, num_agents=6, num_replan=2
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda p, b, k: model.forward(p, b, "val", k))(
        params, batch, jax.random.PRNGKey(7)
    )
    assert out["motion_pred"].shape[-3] == K
    mask = np.asarray(batch.prompt.mask)
    assert np.isfinite(np.asarray(out["rollout_traj"])[mask]).all()

    with pytest.raises(ValueError):
        bad = get_config(opts=SMALL_OPTS + [
            "MODEL.POLICY.ACT_DECODER.TRAJ.PRED_MODE", "cluster",
            "MODEL.POLICY.ACT_DECODER.TRAJ.CLUSTER_PATH", path,
            "MODEL.POLICY.ACT_DECODER.TRAJ.K", str(K + 1),
        ])
        ProSim(bad)


def test_mlp_map_obs_encoders():
    """MLP encoder variants (reference: map_encoder.py:5-65, obs_encoder.py:19-74)
    with masked mean/max pool semantics."""
    from prosim_tpu.models.scene_encoder import _masked_pool

    # masked pool semantics: invalid rows never contribute; empty rows -> 0 (mean)
    x = jnp.asarray([[[1.0, 2.0], [100.0, -100.0], [3.0, 4.0]]])
    m = jnp.asarray([[True, False, True]])
    np.testing.assert_allclose(np.asarray(_masked_pool(x, m, "mean"))[0], [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(_masked_pool(x, m, "max"))[0], [3.0, 4.0])
    empty = _masked_pool(x, jnp.zeros_like(m), "mean")
    np.testing.assert_allclose(np.asarray(empty)[0], [0.0, 0.0])

    for pool in ("max", "mean", "none"):
        cfg = get_config(opts=SMALL_OPTS + [
            "MODEL.SCENE_ENCODER.MAP_TYPE", "mlp",
            "MODEL.SCENE_ENCODER.OBS_TYPE", "mlp",
            "MODEL.MAP_ENCODER.MLP.POOL", "max" if pool == "none" else pool,
            "MODEL.OBS_ENCODER.MLP.POOL", pool,
        ])
        model = ProSim(cfg)
        batch = make_synthetic_batch(
            cfg, batch_size=1, num_lanes=8, num_obs_agents=6, num_agents=4, num_replan=1
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.forward(params, batch, "val", jax.random.PRNGKey(1))
        mask = np.asarray(batch.prompt.mask)
        assert np.isfinite(np.asarray(out["rollout_traj"])[mask]).all(), pool


def test_policy_aux_pred_modes():
    """'vel_pred'/'goal_pred' aux task heads for sampler models
    (reference: act_decoder.py:51-57,82-89)."""
    from prosim_tpu.data.batch import SceneTokens
    from prosim_tpu.models.policy import PolicyRelPE

    B, N, L, A, D = 1, 4, 8, 6, 16
    rng = np.random.default_rng(0)
    scene = SceneTokens(
        tokens=jnp.asarray(rng.normal(size=(B, L + A, D)), jnp.float32),
        pos=jnp.asarray(rng.normal(scale=20, size=(B, L + A, 2)), jnp.float32),
        ori=jnp.zeros((B, L + A)),
        mask=jnp.ones((B, L + A), bool),
        num_map=L,
    )
    for mode, key, dim in (("vel_pred", "init_vel_pred", 2), ("goal_pred", "goal_pred", 3)):
        pol = PolicyRelPE(
            hidden_dim=D, num_layers=1, num_heads=2, head_dim=4, max_neigh=4,
            agent_radius=100.0, map_radius=100.0, edge_func="knn",
            learnable_pe=False, pe_num_freq=4, motion_k=1, pred_steps=5,
            state_dim=3, pred_mode=mode,
        )
        emd = {"emd": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)}
        args = (
            emd, scene, jnp.zeros((B, N, 2)), jnp.zeros((B, N)),
            jnp.ones((B, N), bool), jnp.ones((B, N), jnp.int32),
        )
        params = pol.init(jax.random.PRNGKey(0), *args)
        out = pol.apply(params, *args)
        assert out[key].shape == (B, N, dim)
        assert "motion_pred" not in out
        assert np.isfinite(np.asarray(out[key])).all()


def test_pred_gmm_train_end_to_end():
    """PRED_GMM: policy emits [x,y,h,log_std1,log_std2,rho,(xd,yd)] and the
    rollout loss consumes the GMM params as a bivariate NLL position term
    (reference: loss_func.py:250-326). Gradients must flow into the motion
    head through the NLL."""
    from prosim_tpu.train.losses import paired_mse_k

    cfg = get_config(opts=SMALL_OPTS + [
        "MODEL.POLICY.ACT_DECODER.TRAJ.PRED_GMM", "True",
    ])
    model = ProSim(cfg)
    batch = make_synthetic_batch(
        cfg, batch_size=1, num_lanes=8, num_obs_agents=6, num_agents=4, num_replan=2
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.forward(params, batch, "val", jax.random.PRNGKey(1))
    state_dim = len(cfg.DATASET.FORMAT.TARGET.ELEMENTS.split(","))
    assert out["motion_pred"].shape[-1] == state_dim + 3

    def loss_fn(p):
        o = model.forward(p, batch, "train", jax.random.PRNGKey(0))
        return paired_mse_k(batch, o, cfg)["full_loss"]

    val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(val))
    g = grads["policy"]["motion_head"]["dense_2"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0

    # the NLL path must actually be live: perturbing only a gmm column of the
    # motion head output changes the loss
    def loss_fn_shifted(p):
        o = model.forward(p, batch, "train", jax.random.PRNGKey(0))
        o = dict(o)
        mp = o["motion_pred"]
        o["motion_pred"] = mp.at[..., 3].add(1.0)  # log_std1 + 1
        return paired_mse_k(batch, o, cfg)["full_loss"]

    v2 = jax.jit(loss_fn_shifted)(params)
    assert abs(float(v2) - float(val)) > 1e-6


@pytest.mark.parametrize("opts", [
    ["MODEL.OBS_UPDATE.FUSION", "mlp"],
    ["MODEL.OBS_UPDATE.ATTN_UPDATE", "True"],
])
def test_obs_update_variants_closed_loop(opts):
    """OBS_UPDATE.FUSION='mlp' fusion MLP and ATTN_UPDATE re-attention paths
    (reference: attn_fusion.py:136-250) run the full closed loop and differ
    from the default replace/no-reattention output."""
    batch_kw = dict(batch_size=1, num_lanes=8, num_obs_agents=6, num_agents=4,
                    num_replan=2)
    cfg0 = get_config(opts=SMALL_OPTS)
    cfg1 = get_config(opts=SMALL_OPTS + opts)
    batch = make_synthetic_batch(cfg0, **batch_kw)
    model1 = ProSim(cfg1)
    params1 = model1.init(jax.random.PRNGKey(0), batch)
    out1 = model1.forward(params1, batch, "val", jax.random.PRNGKey(1))
    mask = np.asarray(batch.prompt.mask)
    traj1 = np.asarray(out1["rollout_traj"])
    assert np.isfinite(traj1[mask]).all()

    # grads flow through the variant-specific parameters too
    def loss_fn(p):
        o = model1.forward(p, batch, "train", jax.random.PRNGKey(0))
        m = batch.prompt.mask[None, :, :, None, None, None]
        return jnp.sum(jnp.where(m, o["motion_pred"], 0.0) ** 2) / 1000.0

    _, grads = jax.jit(jax.value_and_grad(loss_fn))(params1)
    total = sum(
        float(x) for x in jax.tree.leaves(jax.tree.map(lambda g: jnp.abs(g).sum(), grads))
    )
    assert np.isfinite(total) and total > 0
