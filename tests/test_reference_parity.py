"""Golden-parity tests: the REFERENCE torch implementation (imported in place
from /root/reference via tests/reference_oracle.py) is run as the oracle on
the same inputs (and converted weights) as the prosim_tpu JAX modules.

Covers (VERDICT round-1 item 1):
  geometry           vs prosim/models/utils/geometry.py:6-58
  rollout_traj       vs prosim/loss/loss_func.py:215-248
  compute_rollout_loss (incl. GMM NLL) vs loss_func.py:315-361, 37-75
  FourierEmbedding{,Fix} vs models/layers/fourier_embedding.py:11-79
  PointNetPolylineEncoder vs models/scene_encoder/pointnet_encoder.py:13-62
  MLP / CG_stacked   vs models/layers/mlp.py:475-494, 207-241
  gated attention    vs an inline segment-softmax port of
                     models/layers/attention_layer.py:87-121 (torch_geometric
                     is absent; the port reproduces message/update verbatim)
  offroad polyline signed distance vs loss_func.py:617-659
  collision box signed distance    vs loss_func.py:1012-1180 (Minkowski)
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests") if "tests" not in sys.path else None
import reference_oracle  # noqa: E402

ref = reference_oracle.load()
torch = ref.torch

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prosim_tpu.config import get_config  # noqa: E402
from prosim_tpu.ops.fourier import FourierEmbedding, FourierEmbeddingFix  # noqa: E402
from prosim_tpu.ops.mlp import MLP, ContextGating  # noqa: E402
from prosim_tpu.ops.pointnet import PointNetPolylineEncoder  # noqa: E402
from prosim_tpu.train import losses as jlosses  # noqa: E402
from prosim_tpu.utils import geometry as jgeo  # noqa: E402

RNG = np.random.default_rng(0)


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def allclose(jax_val, torch_val, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(
        np.asarray(jax_val), torch_val.detach().numpy(), atol=atol, rtol=rtol
    )


# --------------------------------------------------------------- geometry
class TestGeometry:
    def test_wrap_angle(self):
        a = RNG.normal(size=(64,)).astype(np.float32) * 7
        allclose(jgeo.wrap_angle(jnp.asarray(a)), ref.geometry.wrap_angle(t(a)))

    def test_batch_rotate_2d(self):
        xy = RNG.normal(size=(4, 7, 2)).astype(np.float32)
        th = RNG.normal(size=(4, 7)).astype(np.float32) * 3
        allclose(
            jgeo.rotate_2d(jnp.asarray(xy), jnp.asarray(th)),
            ref.geometry.batch_rotate_2D(t(xy), t(th)),
        )

    def test_angle_between_2d_vectors(self):
        a = RNG.normal(size=(5, 3, 2)).astype(np.float32)
        b = RNG.normal(size=(5, 3, 2)).astype(np.float32)
        allclose(
            jgeo.angle_between_2d_vectors(jnp.asarray(a), jnp.asarray(b)),
            ref.geometry.angle_between_2d_vectors(t(a), t(b)),
        )

    def test_rel_traj_coord_to_last_step(self):
        th = RNG.normal(size=(3, 11)).astype(np.float32) * 3
        traj = np.concatenate(
            [
                RNG.normal(size=(3, 11, 2)).astype(np.float32) * 10,
                np.sin(th)[..., None],
                np.cos(th)[..., None],
            ],
            axis=-1,
        )
        allclose(
            jgeo.rel_traj_to_last_step(jnp.asarray(traj)),
            ref.geometry.rel_traj_coord_to_last_step(t(traj)),
            atol=2e-5,
        )

    def test_rel_vel_coord_to_last_step(self):
        th = RNG.normal(size=(3, 11)).astype(np.float32) * 3
        traj = np.concatenate(
            [
                RNG.normal(size=(3, 11, 2)).astype(np.float32) * 10,
                np.sin(th)[..., None],
                np.cos(th)[..., None],
            ],
            axis=-1,
        )
        vel = RNG.normal(size=(3, 11, 2)).astype(np.float32) * 5
        allclose(
            jgeo.rel_vel_to_last_step(jnp.asarray(traj), jnp.asarray(vel)),
            ref.geometry.rel_vel_coord_to_last_step(t(traj), t(vel)),
            atol=2e-5,
        )


# ------------------------------------------------------- rollout integration
class TestRolloutLoss:
    @pytest.mark.parametrize("D", [3, 5])
    def test_rollout_traj(self, D):
        traj = RNG.normal(size=(2, 4, 3, 10, D)).astype(np.float32)
        allclose(
            jlosses.rollout_traj(jnp.asarray(traj), 10),
            ref.loss_func.rollout_traj(t(traj), 10),
            atol=2e-5,
        )

    def test_rollout_traj_partial_steps(self):
        # rollout_steps < pred_steps (replan uses only the first chunk part)
        traj = RNG.normal(size=(1, 3, 4, 10, 3)).astype(np.float32)
        allclose(
            jlosses.rollout_traj(jnp.asarray(traj), 5),
            ref.loss_func.rollout_traj(t(traj), 5),
            atol=2e-5,
        )

    @pytest.mark.parametrize("crit", ["mse", "huber"])
    @pytest.mark.parametrize("D", [3, 5])
    def test_compute_rollout_loss(self, crit, D):
        cfg = get_config(opts=["LOSS.TRAJ_CRITERION.TYPE", crit])
        B, N, T = 2, 5, 20
        tgt = RNG.normal(size=(B, N, T, D)).astype(np.float32)
        pred = RNG.normal(size=(B, N, T, D)).astype(np.float32)
        valid = RNG.random(size=(B, N, T, D)) > 0.3
        valid[:, 0] = True  # ensure >=1 fully-valid agent

        jl, jper = jlosses.compute_rollout_loss(
            jnp.asarray(tgt), jnp.asarray(pred),
            jnp.asarray(valid[..., :2].all(-1)), cfg,
        )
        rl, rper = ref.loss_func.compute_rollout_loss(
            t(tgt), t(pred), torch.tensor(valid), cfg
        )
        for key in rl:
            allclose(jl[key], rl[key], atol=1e-5)
        for key in ("pos", "heading") + (("vel",) if D == 5 else ()):
            allclose(jper[key], rper[key], atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(jper["agent_valid"]), rper["agent_valid_mask"].numpy()
        )

    def test_compute_rollout_loss_gmm(self):
        cfg = get_config(opts=["LOSS.TRAJ_CRITERION.TYPE", "huber"])
        B, N, T = 2, 4, 10
        tgt = RNG.normal(size=(B, N, T, 3)).astype(np.float32)
        pred = RNG.normal(size=(B, N, T, 3)).astype(np.float32)
        gmm = RNG.normal(size=(B, N, T, 3)).astype(np.float32)
        valid = np.ones((B, N, T, 3), bool)

        jl, _ = jlosses.compute_rollout_loss(
            jnp.asarray(tgt), jnp.asarray(pred),
            jnp.asarray(valid[..., :2].all(-1)), cfg,
            gmm_params=jnp.asarray(gmm),
        )
        rl, _ = ref.loss_func.compute_rollout_loss(
            t(tgt), t(pred), torch.tensor(valid), cfg,
            model_gmm_params_batch=t(gmm),
        )
        for key in rl:
            allclose(jl[key], rl[key], atol=2e-5)

    def test_gmm_nll_matches_compute_gmm_dist(self):
        tgt = RNG.normal(size=(4, 10, 3)).astype(np.float32)
        pred = RNG.normal(size=(4, 10, 3)).astype(np.float32)
        gmm = RNG.normal(size=(4, 10, 3)).astype(np.float32)
        allclose(
            jlosses.gmm_nll(jnp.asarray(tgt[..., :2]), jnp.asarray(pred[..., :2]),
                            jnp.asarray(gmm)),
            ref.loss_func.compute_gmm_dist(t(tgt), t(pred), t(gmm),
                                           (-1.609, 5.0), 0.5),
            atol=2e-5,
        )


# --------------------------------------------------------------- MLP family
def torch_mlp_params(tmlp, without_norm=False):
    """torch MLP state_dict -> flax MLP params (dense_i / norm_i)."""
    from prosim_tpu.utils.checkpoint_convert import _map_mlp_key

    out = {}
    for key, val in tmlp.state_dict().items():
        sub, leaf = _map_mlp_key(key, without_norm=without_norm)
        v = val.numpy()
        if leaf == "weight":
            name, v = ("kernel", v.T) if sub.startswith("dense") else ("scale", v)
        else:
            name = "bias"
        out.setdefault(sub, {})[name] = jnp.asarray(v)
    return out


class TestMLPFamily:
    @pytest.mark.parametrize("ret_before_act,without_norm",
                             [(False, False), (True, False), (True, True)])
    def test_mlp(self, ret_before_act, without_norm):
        dims = [6, 16, 16, 8]
        tm = ref.mlp.MLP(dims, ret_before_act=ret_before_act,
                         without_norm=without_norm)
        x = RNG.normal(size=(5, 6)).astype(np.float32)
        want = tm(t(x))

        jm = MLP(dims, ret_before_act=ret_before_act, without_norm=without_norm)
        params = torch_mlp_params(tm, without_norm=without_norm)
        got = jm.apply({"params": params}, jnp.asarray(x))
        allclose(got, want, atol=2e-5)

    def test_cg_stacked(self):
        H, S, B, blocks = 16, 7, 3, 3
        tcg = ref.mlp.CG_stacked(blocks, H)
        tokens = RNG.normal(size=(B, S, H)).astype(np.float32)
        context = RNG.normal(size=(B, H)).astype(np.float32)
        mask = RNG.random(size=(B, S)) > 0.3
        mask[:, 0] = True
        want_tok, want_ctx = tcg(t(tokens), t(context), torch.tensor(mask))

        params = {}
        for i in range(blocks):
            sd = tcg.CGs[i].state_dict()
            params[f"block_{i}"] = {
                "dense": {"kernel": jnp.asarray(sd["MLP.0.weight"].numpy().T),
                          "bias": jnp.asarray(sd["MLP.0.bias"].numpy())},
                "norm": {"scale": jnp.asarray(sd["MLP.1.weight"].numpy()),
                         "bias": jnp.asarray(sd["MLP.1.bias"].numpy())},
            }
        jcg = ContextGating(num_blocks=blocks, hidden_dim=H)
        got_tok, got_ctx = jcg.apply(
            {"params": params}, jnp.asarray(tokens), jnp.asarray(context),
            jnp.asarray(mask),
        )
        allclose(got_tok, want_tok, atol=2e-5)
        allclose(got_ctx, want_ctx, atol=2e-5)


# ----------------------------------------------------------------- Fourier
class TestFourier:
    def test_fixed(self):
        x = RNG.normal(size=(4, 3)).astype(np.float32)
        want = ref.fourier.FourierEmbeddingFix(num_pos_feats=32)(t(x))
        got = FourierEmbeddingFix(num_pos_feats=32).apply({}, jnp.asarray(x))
        allclose(got, want, atol=2e-5)

    def test_learnable(self):
        D, H, F = 3, 16, 8
        tm = ref.fourier.FourierEmbedding(D, H, F)
        x = RNG.normal(size=(6, D)).astype(np.float32)
        want = tm(t(x))

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = {"freqs": jnp.asarray(sd["freqs.weight"])}
        for i in range(D):
            params[f"mlp_{i}_dense0"] = {
                "kernel": jnp.asarray(sd[f"mlps.{i}.0.weight"].T),
                "bias": jnp.asarray(sd[f"mlps.{i}.0.bias"]),
            }
            params[f"mlp_{i}_norm"] = {
                "scale": jnp.asarray(sd[f"mlps.{i}.1.weight"]),
                "bias": jnp.asarray(sd[f"mlps.{i}.1.bias"]),
            }
            params[f"mlp_{i}_dense1"] = {
                "kernel": jnp.asarray(sd[f"mlps.{i}.3.weight"].T),
                "bias": jnp.asarray(sd[f"mlps.{i}.3.bias"]),
            }
        params["out_norm"] = {"scale": jnp.asarray(sd["to_out.0.weight"]),
                              "bias": jnp.asarray(sd["to_out.0.bias"])}
        params["out_dense"] = {"kernel": jnp.asarray(sd["to_out.2.weight"].T),
                               "bias": jnp.asarray(sd["to_out.2.bias"])}
        got = FourierEmbedding(input_dim=D, hidden_dim=H, num_freq_bands=F).apply(
            {"params": params}, jnp.asarray(x)
        )
        allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------- PointNet
class _LayerCfg:
    def __init__(self, num_mlp, num_pre):
        self.NUM_MLP_LAYERS = num_mlp
        self.NUM_PRE_LAYERS = num_pre


class TestPointNet:
    def test_polyline_encoder(self):
        in_dim, H = 9, 16
        tm = ref.pointnet.PointNetPolylineEncoder(in_dim, H, _LayerCfg(3, 1))
        B, L, P = 2, 5, 6
        poly = RNG.normal(size=(B, L, P, in_dim)).astype(np.float32)
        mask = RNG.random(size=(B, L, P)) > 0.3
        mask[:, 0, 0] = True
        want = tm(t(poly), torch.tensor(mask))

        params = {
            "pre_mlps": torch_mlp_params(tm.pre_mlps),
            "mlps": torch_mlp_params(tm.mlps),
            "out_mlps": torch_mlp_params(tm.out_mlps, without_norm=True),
        }
        jm = PointNetPolylineEncoder(in_dim=in_dim, hidden_dim=H,
                                     num_pre_layers=1, num_mlp_layers=3)
        got = jm.apply({"params": params}, jnp.asarray(poly), jnp.asarray(mask))
        allclose(got, want, atol=2e-5)


# ----------------------------------------------------- gated attention layer
class TorchGatedAttentionOracle(torch.nn.Module):
    """Inline port of the reference AttentionLayer (attention_layer.py:13-121)
    replacing MessagePassing.propagate with an explicit edge-list segment
    softmax; message()/update() math is reproduced verbatim."""

    def __init__(self, hidden_dim, num_heads, head_dim, bipartite):
        super().__init__()
        nn = torch.nn
        self.num_heads, self.head_dim = num_heads, head_dim
        self.scale = head_dim ** -0.5
        inner = head_dim * num_heads
        self.to_q = nn.Linear(hidden_dim, inner)
        self.to_k = nn.Linear(hidden_dim, inner, bias=False)
        self.to_v = nn.Linear(hidden_dim, inner)
        self.to_k_r = nn.Linear(hidden_dim, inner, bias=False)
        self.to_v_r = nn.Linear(hidden_dim, inner)
        self.to_s = nn.Linear(hidden_dim, inner)
        self.to_g = nn.Linear(inner + hidden_dim, inner)
        self.to_out = nn.Linear(inner, hidden_dim)
        self.ff_mlp = nn.Sequential(
            nn.Linear(hidden_dim, hidden_dim * 4),
            nn.ReLU(inplace=True),
            nn.Dropout(0.0),
            nn.Linear(hidden_dim * 4, hidden_dim),
        )
        self.attn_prenorm_x_src = nn.LayerNorm(hidden_dim)
        self.attn_prenorm_x_dst = (
            nn.LayerNorm(hidden_dim) if bipartite else self.attn_prenorm_x_src
        )
        self.attn_prenorm_r = nn.LayerNorm(hidden_dim)
        self.attn_postnorm = nn.LayerNorm(hidden_dim)
        self.ff_prenorm = nn.LayerNorm(hidden_dim)
        self.ff_postnorm = nn.LayerNorm(hidden_dim)

    def forward(self, x_src_raw, x_dst_raw, r_raw, edge_index):
        H, hd = self.num_heads, self.head_dim
        src, dst = edge_index
        x_src = self.attn_prenorm_x_src(x_src_raw)
        x_dst = self.attn_prenorm_x_dst(x_dst_raw)
        r = self.attn_prenorm_r(r_raw)

        q = self.to_q(x_dst).view(-1, H, hd)
        k = self.to_k(x_src).view(-1, H, hd)
        v = self.to_v(x_src).view(-1, H, hd)
        # message()
        k_j = k[src] + self.to_k_r(r).view(-1, H, hd)
        v_j = v[src] + self.to_v_r(r).view(-1, H, hd)
        sim = (q[dst] * k_j).sum(-1) * self.scale  # [E, H]
        nd = x_dst.shape[0]
        m = torch.full((nd, H), -1e30).scatter_reduce(
            0, dst[:, None].expand(-1, H), sim, "amax", include_self=True
        )
        ex = torch.exp(sim - m[dst])
        den = torch.zeros(nd, H).index_add(0, dst, ex)
        attn = ex / den[dst]
        msg = v_j * attn.unsqueeze(-1)
        agg = torch.zeros(nd, H, hd).index_add(0, dst, msg)
        # update()
        inputs = agg.view(nd, H * hd)
        g = torch.sigmoid(self.to_g(torch.cat([inputs, x_dst], dim=-1)))
        gated = inputs + g * (self.to_s(x_dst) - inputs)
        out = self.to_out(gated)
        x = x_dst_raw + self.attn_postnorm(out)
        x = x + self.ff_postnorm(self.ff_mlp(self.ff_prenorm(x)))
        return x


def _attn_flax_params(tm, bipartite):
    def lin(mod):
        p = {"kernel": jnp.asarray(mod.weight.detach().numpy().T)}
        if mod.bias is not None:
            p["bias"] = jnp.asarray(mod.bias.detach().numpy())
        return p

    def norm(mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {
        "prenorm_src": norm(tm.attn_prenorm_x_src),
        "prenorm_r": norm(tm.attn_prenorm_r),
        "postnorm": norm(tm.attn_postnorm),
        "ff_prenorm": norm(tm.ff_prenorm),
        "ff_postnorm": norm(tm.ff_postnorm),
        "to_q": lin(tm.to_q), "to_k": lin(tm.to_k), "to_v": lin(tm.to_v),
        "to_k_r": lin(tm.to_k_r), "to_v_r": lin(tm.to_v_r),
        "to_s": lin(tm.to_s), "to_g": lin(tm.to_g), "to_out": lin(tm.to_out),
        "ff_dense0": lin(tm.ff_mlp[0]), "ff_dense1": lin(tm.ff_mlp[3]),
    }
    if bipartite:
        params["prenorm_dst"] = norm(tm.attn_prenorm_x_dst)
    return params


class TestGatedAttention:
    @pytest.mark.parametrize("bipartite", [False, True])
    def test_vs_reference_port(self, bipartite):
        from prosim_tpu.ops.attention import GatedNeighborAttention

        Dh, H, hd = 32, 4, 8
        B, Q, S, K = 2, 6, 9, 4
        tm = TorchGatedAttentionOracle(Dh, H, hd, bipartite)
        x_dst = RNG.normal(size=(B, Q, Dh)).astype(np.float32)
        x_src = RNG.normal(size=(B, S, Dh)).astype(np.float32)
        idx = RNG.integers(0, S, size=(B, Q, K)).astype(np.int32)
        valid = RNG.random(size=(B, Q, K)) > 0.25
        valid[:, -1] = False  # a query with zero neighbors
        rel_pe = RNG.normal(size=(B, Q, K, Dh)).astype(np.float32)

        # flatten to the torch edge list
        srcs, dsts, rs = [], [], []
        for b in range(B):
            for q in range(Q):
                for k in range(K):
                    if valid[b, q, k]:
                        srcs.append(b * S + idx[b, q, k])
                        dsts.append(b * Q + q)
                        rs.append(rel_pe[b, q, k])
        edge_index = (torch.tensor(srcs, dtype=torch.long),
                      torch.tensor(dsts, dtype=torch.long))
        want = tm(
            t(x_src.reshape(-1, Dh)), t(x_dst.reshape(-1, Dh)),
            t(np.stack(rs)), edge_index,
        ).reshape(B, Q, Dh)

        jm = GatedNeighborAttention(
            hidden_dim=Dh, num_heads=H, head_dim=hd, bipartite=bipartite
        )
        got = jm.apply(
            {"params": _attn_flax_params(tm, bipartite)},
            jnp.asarray(x_dst), jnp.asarray(x_src), jnp.asarray(idx),
            jnp.asarray(valid), jnp.asarray(rel_pe),
        )
        allclose(got, want, atol=5e-5, rtol=5e-5)


class TestGatedAttentionRealReference:
    """Parity vs the REFERENCE AttentionLayer imported in place
    (reference: prosim/models/layers/attention_layer.py:13-121) running on
    the torch_geometric MessagePassing/segment-softmax shim
    (tests/ref_shims.py). Closes the hand-port-oracle gap: a transcription
    bug in TorchGatedAttentionOracle would be caught here."""

    @pytest.mark.parametrize("bipartite", [False, True])
    def test_real_layer_vs_flax(self, bipartite):
        from prosim_tpu.ops.attention import GatedNeighborAttention

        ref = reference_oracle.load_model()
        Dh, H, hd = 32, 4, 8
        B, Q, S, K = 2, 6, 9, 4
        torch.manual_seed(3)
        tm = ref.attention_layer.AttentionLayer(
            hidden_dim=Dh, num_heads=H, head_dim=hd, dropout=0.0,
            bipartite=bipartite, has_pos_emb=True,
        ).eval()

        x_dst = RNG.normal(size=(B, Q, Dh)).astype(np.float32)
        x_src = RNG.normal(size=(B, S, Dh)).astype(np.float32)
        idx = RNG.integers(0, S, size=(B, Q, K)).astype(np.int32)
        valid = RNG.random(size=(B, Q, K)) > 0.25
        valid[:, -1] = False  # a query with zero neighbors
        rel_pe = RNG.normal(size=(B, Q, K, Dh)).astype(np.float32)

        if not bipartite:
            # non-bipartite reference call sites pass one node set
            # (attn_fusion.py:117-119): dst q is node q of the src set
            x_dst = x_src[:, :Q].copy()
        dst_stride = Q if bipartite else S
        srcs, dsts, rs = [], [], []
        for b in range(B):
            for q in range(Q):
                for k in range(K):
                    if valid[b, q, k]:
                        srcs.append(b * S + idx[b, q, k])
                        dsts.append(b * dst_stride + q)
                        rs.append(rel_pe[b, q, k])
        edge_index = torch.stack([torch.tensor(srcs, dtype=torch.long),
                                  torch.tensor(dsts, dtype=torch.long)])
        with torch.no_grad():
            if bipartite:
                want = tm((t(x_src.reshape(-1, Dh)), t(x_dst.reshape(-1, Dh))),
                          t(np.stack(rs)), edge_index)
            else:
                want = tm(t(x_src.reshape(-1, Dh)), t(np.stack(rs)),
                          edge_index)
        want = want.numpy().reshape(B, -1, Dh)[:, :Q]

        jm = GatedNeighborAttention(
            hidden_dim=Dh, num_heads=H, head_dim=hd, bipartite=bipartite
        )
        got = jm.apply(
            {"params": _attn_flax_params(tm, bipartite)},
            jnp.asarray(x_dst), jnp.asarray(x_src), jnp.asarray(idx),
            jnp.asarray(valid), jnp.asarray(rel_pe),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=5e-5)


# ----------------------------------------------------- offroad / collision
class TestOffroadParity:
    def test_signed_distance_to_polyline(self):
        from prosim_tpu.train.safety_losses import signed_distance_to_edges

        # open polyline, generic position queries
        n_seg = 12
        angles = np.cumsum(RNG.normal(0, 0.4, size=n_seg + 1))
        pts = np.cumsum(
            np.stack([np.cos(angles), np.sin(angles)], -1) * 2.0, axis=0
        ).astype(np.float32)
        queries = (RNG.normal(size=(200, 2)) * 6 + pts.mean(0)).astype(np.float32)

        want = ref.loss_func._compute_signed_distance_to_polyline(
            t(queries), t(pts)
        ).numpy()

        got = np.asarray(signed_distance_to_edges(
            jnp.asarray(queries),
            jnp.asarray(pts[:-1]), jnp.asarray(pts[1:]),
            jnp.ones(n_seg, bool),
        ))

        # magnitudes must match everywhere
        np.testing.assert_allclose(np.abs(got), np.abs(want), atol=1e-4)

        # signs must match wherever the nearest feature is a segment interior
        # (at vertices the reference resolves the sign with convexity logic
        # that an independent-segment formulation cannot see)
        d = queries[:, None] - pts[None, :-1]
        e = (pts[1:] - pts[:-1])[None]
        tt = (d * e).sum(-1) / np.maximum((e * e).sum(-1), 1e-9)
        seg_d = np.linalg.norm(d - e * np.clip(tt, 0, 1)[..., None], axis=-1)
        amin = seg_d.argmin(-1)
        interior = (tt[np.arange(len(queries)), amin] > 0.02) & (
            tt[np.arange(len(queries)), amin] < 0.98
        )
        assert interior.sum() > 50
        np.testing.assert_allclose(got[interior], want[interior], atol=1e-4)


class TestCollisionParity:
    def _ref_box_distance(self, xy_a, h_a, ext_a, xy_b, h_b, ext_b):
        n = xy_a.shape[0]
        def corners(xy, h, ext):
            box = torch.zeros(n, 7)
            box[:, :2] = t(xy)
            box[:, 3] = t(ext[:, 0])
            box[:, 4] = t(ext[:, 1])
            box[:, 6] = t(h)
            return ref.loss_func.get_upright_3d_box_corners(box)[:, :4, :2]

        ca, cb = corners(xy_a, h_a, ext_a), corners(xy_b, h_b, ext_b)
        mk = ref.loss_func.minkowski_sum_of_box_and_box_points_pytorch(ca, -cb)
        return ref.loss_func.signed_distance_from_point_to_convex_polygon_pytorch(
            torch.zeros(n, 2), mk
        ).numpy()

    def test_sat_vs_minkowski(self):
        from prosim_tpu.train.safety_losses import _sat_signed_distance

        n = 400
        xy_a = RNG.normal(size=(n, 2)).astype(np.float32) * 2
        xy_b = RNG.normal(size=(n, 2)).astype(np.float32) * 2
        h_a = RNG.normal(size=(n,)).astype(np.float32) * 3
        h_b = RNG.normal(size=(n,)).astype(np.float32) * 3
        ext_a = RNG.uniform(1, 5, size=(n, 2)).astype(np.float32)
        ext_b = RNG.uniform(1, 5, size=(n, 2)).astype(np.float32)

        want = self._ref_box_distance(xy_a, h_a, ext_a, xy_b, h_b, ext_b)
        got = np.asarray(_sat_signed_distance(
            jnp.asarray(xy_a), jnp.asarray(h_a), jnp.asarray(ext_a),
            jnp.asarray(xy_b), jnp.asarray(h_b), jnp.asarray(ext_b),
        ))

        overlap = want < -1e-3
        separate = want > 1e-3
        assert overlap.sum() > 20 and separate.sum() > 20
        # collision decision identical
        np.testing.assert_array_equal(got[overlap] < 0, np.ones(overlap.sum(), bool))
        np.testing.assert_array_equal(got[separate] > 0, np.ones(separate.sum(), bool))
        # penetration depth exact (MTD of convex polygons lies on a face axis)
        np.testing.assert_allclose(got[overlap], want[overlap], atol=1e-4)
        # for separated boxes SAT is a lower bound on the true distance
        assert np.all(got[separate] <= want[separate] + 1e-4)


class TestWosacBoxDistanceParity:
    def test_pair_box_distance_exact_both_regimes(self):
        """The WOSAC distance_to_nearest_object feature uses exact oriented
        box distance; verify both penetration AND separation against the
        reference Minkowski-sum pipeline (loss_func.py:1012-1180)."""
        from prosim_tpu.rollout.wosac_metrics import _pair_box_distance

        n = 120
        xy = RNG.normal(size=(n, 2, 1, 2)).astype(np.float32) * 3
        h = RNG.normal(size=(n, 2, 1)).astype(np.float32) * 3
        ext = RNG.uniform(1, 5, size=(n, 2, 2)).astype(np.float32)

        got = np.array([
            _pair_box_distance(xy[i], h[i], ext[i])[0, 1, 0] for i in range(n)
        ])

        oracle = TestCollisionParity()
        want = oracle._ref_box_distance(
            xy[:, 0, 0], h[:, 0, 0], ext[:, 0],
            xy[:, 1, 0], h[:, 1, 0], ext[:, 1],
        )
        np.testing.assert_allclose(got, want, atol=2e-4)


# ------------------------------------------------------- motion-tag utils
class TestMotionTagProcessing:
    """Fuzz parity of interval post-processing against the reference
    motion_tag_utils (stdlib-only; imported in place)."""

    @staticmethod
    def _ref_mod():
        import importlib

        return importlib.import_module("prosim.dataset.motion_tag_utils")

    @staticmethod
    def _ours(tags):
        from prosim_tpu.data.motion_tags import MotionTag

        return [MotionTag(t["tag"], tuple(t["agents"]), tuple(t["interval"]),
                          t["type"]) for t in tags]

    @staticmethod
    def _as_set(tag_dicts):
        return sorted((d["tag"], tuple(d["agents"]), tuple(d["interval"]))
                      for d in tag_dicts)

    @staticmethod
    def _ours_as_set(tags):
        return sorted((t.tag, tuple(t.agents), tuple(t.interval))
                      for t in tags)

    def _random_tags(self, rng, n):
        names = ["Stopping", "Accelerate", "Decelerate", "KeepSpeed",
                 "LeftLaneChange", "RightLaneChange", "KeepLane", "LeftTurn",
                 "RightTurn", "Straight", "Parked"]
        out = []
        for _ in range(n):
            tag = names[rng.integers(len(names))]
            agents = [["a"], ["b"], ["a", "b"]][rng.integers(3)]
            s = int(rng.integers(0, 80))
            e = s + int(rng.integers(1, 40))
            out.append({"tag": tag, "agents": agents, "interval": (s, e),
                        "type": "unary" if len(agents) == 1 else "binary"})
        return out

    def test_integrate_parity_fuzz(self):
        mtu = self._ref_mod()
        from prosim_tpu.data.motion_tags import integrate_tags

        rng = np.random.default_rng(1)
        for trial in range(50):
            tags = self._random_tags(rng, int(rng.integers(1, 25)))
            tol = int(rng.integers(0, 15))
            ref_out = mtu.integrate_motion_tags(
                {"s": mtu.MotionTags([tags])}, tolerance=tol)
            ref_set = self._as_set(ref_out["s"].motion_tags[0])
            ours = self._ours_as_set(integrate_tags(self._ours(tags), tol))
            assert ours == ref_set, f"trial {trial}"

    def test_remove_short_parity_fuzz(self):
        mtu = self._ref_mod()
        from prosim_tpu.data.motion_tags import remove_short_tags

        rng = np.random.default_rng(2)
        for trial in range(20):
            tags = self._random_tags(rng, int(rng.integers(1, 25)))
            md = int(rng.integers(0, 30))
            ref_out = mtu.remove_short_motion_tags(
                {"s": mtu.MotionTags([tags])}, min_duration=md)
            ref_set = self._as_set(ref_out["s"].motion_tags[0])
            ours = self._ours_as_set(remove_short_tags(self._ours(tags), md))
            assert ours == ref_set, f"trial {trial}"

    def test_resolve_conflicts_parity_fuzz(self):
        mtu = self._ref_mod()
        from prosim_tpu.data.motion_tags import resolve_conflicts

        rng = np.random.default_rng(3)
        for trial in range(100):
            tags = self._random_tags(rng, int(rng.integers(1, 20)))
            ref_out = mtu.resolve_and_adjust_conflicts(
                {"s": mtu.MotionTags([tags])},
                mtu.exclusion_groups, mtu.priority_dict)
            ref_set = self._as_set(ref_out["s"].motion_tags[0])
            ours = self._ours_as_set(resolve_conflicts(self._ours(tags)))
            assert ours == ref_set, f"trial {trial}"

    def test_full_chain_parity_fuzz(self):
        """integrate -> remove-short -> resolve, the process_tags order."""
        mtu = self._ref_mod()
        from prosim_tpu.data.motion_tags import process_tags

        rng = np.random.default_rng(4)
        for trial in range(30):
            tags = self._random_tags(rng, int(rng.integers(1, 25)))
            snap = {"s": mtu.MotionTags([tags])}
            snap = mtu.integrate_motion_tags(snap, tolerance=10)
            snap = mtu.remove_short_motion_tags(snap, min_duration=10)
            snap = mtu.resolve_and_adjust_conflicts(
                snap, mtu.exclusion_groups, mtu.priority_dict)
            ref_set = self._as_set(snap["s"].motion_tags[0])
            ours = self._ours_as_set(process_tags(self._ours(tags), 10, 10))
            assert ours == ref_set, f"trial {trial}"

    def test_enum_values_match(self):
        mtu = self._ref_mod()
        from prosim_tpu.data.motion_tags import V2VTag, VActionTag

        for m in mtu.V_Action_MotionTag:
            assert VActionTag[m.name].value == m.value
        for m in mtu.V2V_MotionTag:
            assert V2VTag[m.name].value == m.value
