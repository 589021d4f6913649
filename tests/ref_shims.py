"""Dependency shims that let the REFERENCE torch implementation
(/root/reference/prosim) run in place as a golden oracle.

The reference depends on torch_cluster / torch_geometric / pytorch_lightning /
wandb / trajdata, none of which are installed here. Each shim below is an
original re-implementation of the *minimal public API surface* the reference
actually exercises, written from the documented semantics of those public
libraries (torch_cluster kNN/radius, PyG MessagePassing flow
'source_to_target', trajdata StateTensor element formats). Nothing is copied
from reference or third-party sources; the shims exist purely so the
reference code can execute at test time as a numerical oracle.

Install order matters: call install() BEFORE importing any reference module.
"""

import inspect
import sys
import types

import numpy as np
import torch
import torch.nn as nn

# ---------------------------------------------------------------------------
# torch_cluster
# ---------------------------------------------------------------------------
# Semantics (torch_cluster public API, used at
# reference attn_fusion.py:107-155, sym_coord.py:85-97, act_decoder.py:249-262):
#   knn(x, y, k, batch_x, batch_y) -> [2, E] rows (y_idx, x_idx); per query y
#       the k nearest x in the same batch, nearest-first, index tie-break.
#   knn_graph(x, k, batch, loop, flow='source_to_target') -> [2, E]
#       rows (neighbor=src, query=dst); self loop kept iff loop=True.
#   radius(x, y, r, batch_x, batch_y, max_num_neighbors) -> [2, E]
#       rows (y_idx, x_idx); per query y up to max_num_neighbors x within r,
#       in x-index order (torch_cluster truncates by index order, NOT by
#       distance - parity tests must use settings where no truncation occurs).
#   radius_graph(x, r, batch, loop, max_num_neighbors) -> [2, E]
#       rows (src, dst) like knn_graph.


def _pairwise_valid(x, y, batch_x, batch_y):
    d = torch.cdist(y.float(), x.float())  # [Ny, Nx]
    if batch_x is not None or batch_y is not None:
        bx = batch_x if batch_x is not None else torch.zeros(
            x.shape[0], dtype=torch.long)
        by = batch_y if batch_y is not None else torch.zeros(
            y.shape[0], dtype=torch.long)
        same = by[:, None] == bx[None, :]
        d = torch.where(same, d, torch.full_like(d, float("inf")))
    return d


def _tc_knn(x, y, k, batch_x=None, batch_y=None):
    if x.numel() == 0 or y.numel() == 0:
        return torch.empty(2, 0, dtype=torch.long)
    d = _pairwise_valid(x, y, batch_x, batch_y)
    k_eff = min(int(k), x.shape[0])
    # stable nearest-first with index tie-break: add tiny index ramp
    order = torch.argsort(
        d + torch.arange(x.shape[0])[None, :] * 1e-12, dim=1, stable=True
    )[:, :k_eff]
    dist = torch.gather(d, 1, order)
    rows, cols = [], []
    for yi in range(y.shape[0]):
        valid = torch.isfinite(dist[yi])
        rows.append(torch.full((int(valid.sum()),), yi, dtype=torch.long))
        cols.append(order[yi][valid])
    if not rows:
        return torch.empty(2, 0, dtype=torch.long)
    return torch.stack([torch.cat(rows), torch.cat(cols)])


def _tc_knn_graph(x, k, batch=None, loop=False, flow="source_to_target"):
    ei = _tc_knn(x, x, k if loop else k + 1, batch, batch)
    row, col = (ei[1], ei[0]) if flow == "source_to_target" else (ei[0], ei[1])
    if not loop:
        m = row != col
        row, col = row[m], col[m]
    return torch.stack([row, col])


def _tc_radius(x, y, r, batch_x=None, batch_y=None, max_num_neighbors=32):
    if x.numel() == 0 or y.numel() == 0:
        return torch.empty(2, 0, dtype=torch.long)
    d = _pairwise_valid(x, y, batch_x, batch_y)
    rows, cols = [], []
    for yi in range(y.shape[0]):
        within = torch.nonzero(d[yi] <= r, as_tuple=False).flatten()
        within = within[:max_num_neighbors]  # index-order truncation
        rows.append(torch.full((within.numel(),), yi, dtype=torch.long))
        cols.append(within)
    return torch.stack([torch.cat(rows), torch.cat(cols)])


def _tc_radius_graph(x, r, batch=None, loop=False, max_num_neighbors=32,
                     flow="source_to_target"):
    ei = _tc_radius(x, x, r, batch, batch, max_num_neighbors + (0 if loop else 1))
    row, col = (ei[1], ei[0]) if flow == "source_to_target" else (ei[0], ei[1])
    if not loop:
        m = row != col
        row, col = row[m], col[m]
    return torch.stack([row, col])


# ---------------------------------------------------------------------------
# torch_geometric: MessagePassing + segment softmax
# ---------------------------------------------------------------------------
# Only the surface exercised by reference attention_layer.py:13-121:
# flow='source_to_target' (suffix `_i` gathers at edge_index[1] = dst,
# `_j` at edge_index[0] = src), aggr='add', then update(inputs, **node_kwargs).


def _pyg_softmax(src, index, ptr=None, num_nodes=None, dim=0):
    if src.numel() == 0:
        return src
    n = int(index.max()) + 1 if num_nodes is None else num_nodes
    shape = (n,) + src.shape[1:]
    mx = src.new_full(shape, float("-inf"))
    mx = mx.index_reduce(0, index, src, "amax", include_self=True)
    out = (src - mx.index_select(0, index)).exp()
    den = src.new_zeros(shape).index_add_(0, index, out)
    return out / (den.index_select(0, index) + 1e-16)


class _MessagePassing(nn.Module):
    def __init__(self, aggr="add", node_dim=0, **kwargs):
        super().__init__()
        assert aggr == "add" and node_dim == 0

    def propagate(self, edge_index, **kwargs):
        src, dst = edge_index[0], edge_index[1]
        msg_params = inspect.signature(self.message).parameters
        msg_kwargs = {}
        for name in msg_params:
            if name == "index":
                msg_kwargs[name] = dst
            elif name == "ptr":
                msg_kwargs[name] = None
            elif name.endswith("_i"):
                msg_kwargs[name] = kwargs[name[:-2]].index_select(0, dst)
            elif name.endswith("_j"):
                msg_kwargs[name] = kwargs[name[:-2]].index_select(0, src)
            else:
                msg_kwargs[name] = kwargs[name]
        out = self.message(**msg_kwargs)

        n_dst = kwargs["x_dst"].shape[0]
        agg = out.new_zeros((n_dst,) + out.shape[1:])
        agg.index_add_(0, dst, out)

        upd_params = list(inspect.signature(self.update).parameters)
        upd_kwargs = {n: kwargs[n] for n in upd_params if n != "inputs"}
        return self.update(agg, **upd_kwargs)

    def message(self, **kwargs):  # pragma: no cover - overridden
        raise NotImplementedError

    def update(self, inputs, **kwargs):  # pragma: no cover - overridden
        return inputs


# ---------------------------------------------------------------------------
# pytorch_lightning / wandb (API no-ops sufficient for model construction)
# ---------------------------------------------------------------------------


class _LightningModule(nn.Module):
    trainer = None
    logger = None

    def log(self, *a, **k):
        pass

    def log_dict(self, *a, **k):
        pass

    def save_hyperparameters(self, *a, **k):
        pass

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")


# ---------------------------------------------------------------------------
# trajdata: StateTensor / StateArray with element formats
# ---------------------------------------------------------------------------
# Element chars: x,y,z positions; xd,yd velocities; xdd,ydd accelerations;
# h heading; s,c = sin/cos heading. Derivations exercised by the reference
# formatter (format_utils.py:376-636): s,c -> h (atan2), h -> s,c.


def _fmt_tuple(fmt):
    return tuple(fmt.split(",")) if isinstance(fmt, str) else tuple(fmt)


class _FormatMixin:
    @property
    def _format_dict(self):
        return {e: i for i, e in enumerate(self._format_tuple)}

    @property
    def _format(self):
        return ",".join(self._format_tuple)

    def _col(self, elem):
        fd = self._format_dict
        if elem in fd:
            return self[..., fd[elem]]
        if elem == "h" and "s" in fd and "c" in fd:
            return self._atan2(self[..., fd["s"]], self[..., fd["c"]])
        if elem == "s" and "h" in fd:
            return self._sin(self[..., fd["h"]])
        if elem == "c" and "h" in fd:
            return self._cos(self[..., fd["h"]])
        raise KeyError(f"cannot derive element {elem!r} from {self._format}")

    def _gather(self, elems):
        return self._stack_last([self._plain(self._col(e)) for e in elems])

    @property
    def position(self):
        return self._gather(("x", "y"))

    @property
    def velocity(self):
        return self._gather(("xd", "yd"))

    @property
    def acceleration(self):
        return self._gather(("xdd", "ydd"))

    @property
    def heading(self):
        return self._gather(("h",))

    @property
    def heading_vector(self):
        # unit direction vector (cos h, sin h): rotating it as 2D coords
        # yields the relative-heading vector, matching trajdata semantics
        return self._gather(("c", "s"))

    def _set(self, elems, value):
        fd = self._format_dict
        for i, e in enumerate(elems):
            self[..., fd[e]] = value[..., i]

    @position.setter
    def position(self, value):
        self._set(("x", "y"), value)

    @velocity.setter
    def velocity(self, value):
        self._set(("xd", "yd"), value)

    @acceleration.setter
    def acceleration(self, value):
        self._set(("xdd", "ydd"), value)

    @heading.setter
    def heading(self, value):
        self._set(("h",), value)

    @heading_vector.setter
    def heading_vector(self, value):
        self._set(("c", "s"), value)


class StateArray(np.ndarray, _FormatMixin):
    def __array_finalize__(self, obj):
        if obj is not None and hasattr(obj, "_format_tuple"):
            self._format_tuple = obj._format_tuple

    @staticmethod
    def _atan2(a, b):
        return np.arctan2(a, b)

    _sin = staticmethod(np.sin)
    _cos = staticmethod(np.cos)

    @staticmethod
    def _plain(x):
        return np.asarray(x)

    @staticmethod
    def _stack_last(cols):
        return np.stack(cols, axis=-1)

    @classmethod
    def from_array(cls, arr, format):
        out = np.asarray(arr).view(cls)
        out._format_tuple = _fmt_tuple(format)
        return out

    def as_format(self, fmt):
        elems = _fmt_tuple(fmt)
        return StateArray.from_array(self._gather(elems), elems)

    def as_ndarray(self):
        return np.asarray(self)


class StateTensor(torch.Tensor, _FormatMixin):
    @staticmethod
    def _atan2(a, b):
        return torch.atan2(a, b)

    _sin = staticmethod(torch.sin)
    _cos = staticmethod(torch.cos)

    @staticmethod
    def _plain(x):
        return torch.as_tensor(x).as_subclass(torch.Tensor)

    @staticmethod
    def _stack_last(cols):
        return torch.stack(cols, dim=-1)

    @classmethod
    def from_array(cls, arr, format):
        out = torch.as_tensor(np.asarray(arr) if isinstance(arr, np.ndarray)
                              else arr).as_subclass(cls)
        out._format_tuple = _fmt_tuple(format)
        return out

    @classmethod
    def from_numpy(cls, arr, format=None):
        if format is None:
            format = ",".join(arr._format_tuple)
        return cls.from_array(np.ascontiguousarray(np.asarray(arr)), format)

    def as_format(self, fmt):
        elems = _fmt_tuple(fmt)
        return StateTensor.from_array(self._gather(elems), elems)

    def as_tensor(self):
        return self.as_subclass(torch.Tensor)

    def numpy(self):
        return StateArray.from_array(
            self.as_subclass(torch.Tensor).detach().cpu().numpy().copy(),
            self._format_tuple,
        )

    def __getitem__(self, item):
        out = super().__getitem__(item)
        if isinstance(out, StateTensor) and hasattr(self, "_format_tuple"):
            out._format_tuple = self._format_tuple
        return out

    @classmethod
    def __torch_function__(cls, func, tys, args=(), kwargs=None):
        out = super().__torch_function__(func, tys, args, kwargs or {})
        # propagate format through ops that keep the state dim (e.g. .float())
        if isinstance(out, StateTensor) and not hasattr(out, "_format_tuple"):
            src = next((a for a in args if isinstance(a, StateTensor)
                        and hasattr(a, "_format_tuple")), None)
            if (src is not None and isinstance(out, torch.Tensor)
                    and out.ndim > 0 and src.ndim > 0
                    and out.shape[-1] == src.shape[-1]):
                out._format_tuple = src._format_tuple
        return out


def rotation_matrix(angle):
    """[..., 2, 2] rotation matrices (trajdata.utils.arr_utils semantics)."""
    angle = np.asarray(angle)
    c, s = np.cos(angle), np.sin(angle)
    return np.stack(
        [np.stack([c, -s], axis=-1), np.stack([s, c], axis=-1)], axis=-2
    )


def angle_wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


class _SceneBatch:
    """Attribute-bag standing in for trajdata SceneBatch (scene-centric)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def to(self, device):
        return self


class _AgentBatch:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _BatchAugmentation:
    pass


# ---------------------------------------------------------------------------
# sys.modules installation
# ---------------------------------------------------------------------------


def _module(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec() on the stub works
    # (transformers/accelerate probe optional deps that way)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_installed = False


def install():
    global _installed
    if _installed:
        return
    _installed = True

    if "yacs" not in sys.modules:
        from prosim_tpu.config.node import CfgNode as _TpuCfgNode

        class _YacsCfgNode(_TpuCfgNode):
            """yacs.config.CfgNode API on top of prosim_tpu's CfgNode so the
            reference config/default.py loads unmodified."""

            def __init__(self, init_dict=None, key_list=None,
                         new_allowed=False):
                super().__init__(init_dict)

            # yacs attribute probed (not called) at default.py:688
            register_renamed_key = None

            def merge_from_other_cfg(self, other):
                self.merge_from_other(other, allow_new=True)

            def merge_from_file(self, path):
                super().merge_from_file(path, allow_new=True)

        yacs = _module("yacs")
        yacs.config = _module("yacs.config", CfgNode=_YacsCfgNode)

    if "torch_cluster" not in sys.modules:
        _module(
            "torch_cluster",
            knn=_tc_knn,
            knn_graph=_tc_knn_graph,
            radius=_tc_radius,
            radius_graph=_tc_radius_graph,
        )

    if "torch_geometric" not in sys.modules:
        tg = _module("torch_geometric")
        tg_nn = _module("torch_geometric.nn")
        conv = _module("torch_geometric.nn.conv", MessagePassing=_MessagePassing)
        utils = _module("torch_geometric.utils", softmax=_pyg_softmax)
        tg.nn, tg.utils, tg_nn.conv = tg_nn, utils, conv

    if "pytorch_lightning" not in sys.modules:
        pl = _module(
            "pytorch_lightning",
            LightningModule=_LightningModule,
            Callback=object,
            Trainer=object,
        )
        utils_mod = _module("pytorch_lightning.utilities")
        types_mod = _module("pytorch_lightning.utilities.types",
                            STEP_OUTPUT=object)
        cb_mod = _module("pytorch_lightning.callbacks", Callback=object)
        pl.utilities, utils_mod.types, pl.callbacks = utils_mod, types_mod, cb_mod

    if "wandb" not in sys.modules:
        _module("wandb", Image=lambda *a, **k: None,
                Video=lambda *a, **k: None, login=lambda *a, **k: None)

    if "torchmetrics" not in sys.modules:
        class _Metric(nn.Module):
            def add_state(self, *a, **k):
                pass

        _module("torchmetrics", Metric=_Metric)

    if "trajdata" not in sys.modules:
        td = _module("trajdata", AgentBatch=_AgentBatch, SceneBatch=_SceneBatch)
        utils_m = _module("trajdata.utils")
        arr_m = _module("trajdata.utils.arr_utils",
                        rotation_matrix=rotation_matrix, angle_wrap=angle_wrap)
        st_m = _module("trajdata.utils.state_utils",
                       StateTensor=StateTensor, StateArray=StateArray)
        aug_m = _module("trajdata.augmentation",
                        BatchAugmentation=_BatchAugmentation)
        ds_m = _module("trajdata.data_structures")
        b_m = _module("trajdata.data_structures.batch",
                      SceneBatch=_SceneBatch, AgentBatch=_AgentBatch)
        td.utils, td.augmentation, td.data_structures = utils_m, aug_m, ds_m
        utils_m.arr_utils, utils_m.state_utils, ds_m.batch = arr_m, st_m, b_m

    # attn_fusion.py:83 / act_decoder.py:240 import memory-telemetry helpers
    # from prosim.rollout.distributed_utils at call time, which would drag in
    # the whole rollout/ + trajdata.simulation stack; no-op them
    if "prosim.rollout.distributed_utils" not in sys.modules:
        _module("prosim.rollout")
        _module(
            "prosim.rollout.distributed_utils",
            check_mem_usage=lambda *a, **k: None,
            print_system_mem_usage=lambda *a, **k: None,
            get_gpu_memory_usage=lambda *a, **k: 0,
        )

    # visualization module pulls trajdata.visualization + scipy filters; the
    # oracle never renders, so stub the two names traj_sam imports from it
    if "prosim.models.utils.visualization" not in sys.modules:
        _module(
            "prosim.models.utils.visualization",
            vis_agent_traj_pred=lambda *a, **k: None,
            vis_scene_traj_pred=lambda *a, **k: None,
        )


SceneBatch = _SceneBatch
AgentBatch = _AgentBatch
