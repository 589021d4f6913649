"""Import machinery that loads the REFERENCE torch implementation
(/root/reference/prosim) as golden oracles for parity tests.

The reference's package __init__ chain pulls in trajdata / torch_geometric /
pytorch_lightning, none of which exist here. But the oracle modules we need
(loss_func, fourier_embedding, pointnet_encoder, mlp, geometry, weight_init)
only depend on torch and each other. We register stub parent packages whose
__path__ points at the real directories, so leaf-module imports execute ONLY
the leaf files, and provide `prosim.dataset.data_utils.rotate` by exec'ing
exactly that function's AST out of the real source file.

Nothing here copies reference code into the repo - the reference is imported
in place, at test time, purely as a numerical oracle.
"""

import ast
import sys
import types

REF = "/root/reference"

_PARENTS = [
    ("prosim", f"{REF}/prosim"),
    ("prosim.core", f"{REF}/prosim/core"),
    ("prosim.models", f"{REF}/prosim/models"),
    ("prosim.models.utils", f"{REF}/prosim/models/utils"),
    ("prosim.models.layers", f"{REF}/prosim/models/layers"),
    ("prosim.models.scene_encoder", f"{REF}/prosim/models/scene_encoder"),
    ("prosim.models.decoder", f"{REF}/prosim/models/decoder"),
    ("prosim.models.policy", f"{REF}/prosim/models/policy"),
    ("prosim.models.prompt_encoder", f"{REF}/prosim/models/prompt_encoder"),
    ("prosim.loss", f"{REF}/prosim/loss"),
    ("prosim.dataset", f"{REF}/prosim/dataset"),
]


def _stub_parent(name: str, path: str):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    sys.modules[name] = mod


def _exec_functions_from(path: str, module_name: str, func_names, glb=None):
    """Execute ONLY the named top-level functions from a reference source file
    into a fresh module (used when the file's other top-level code needs
    unavailable deps)."""
    src = open(path).read()
    tree = ast.parse(src)
    picked = [
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name in func_names
    ]
    assert len(picked) == len(func_names), (
        f"missing {set(func_names) - {n.name for n in picked}} in {path}"
    )
    mod = types.ModuleType(module_name)
    if glb:
        mod.__dict__.update(glb)
    code = compile(ast.Module(body=picked, type_ignores=[]), path, "exec")
    exec(code, mod.__dict__)
    sys.modules[module_name] = mod
    return mod


def _ensure_data_utils():
    """Exec the trajdata-free functions of reference data_utils.py into a
    stub module, against the shimmed StateArray machinery (reference:
    prosim/dataset/data_utils.py:74-311)."""
    if "prosim.dataset.data_utils" in sys.modules:
        return
    import numpy as np
    import torch

    import ref_shims

    _exec_functions_from(
        f"{REF}/prosim/dataset/data_utils.py",
        "prosim.dataset.data_utils",
        ["rotate", "transform_coords_2d_np_offset_rot",
         "transform_to_frame_offset_rot"],
        glb={
            "torch": torch,
            "np": np,
            "StateArray": ref_shims.StateArray,
            "StateTensor": ref_shims.StateTensor,
            "rotation_matrix": ref_shims.rotation_matrix,
            "angle_wrap": ref_shims.angle_wrap,
            "default_trajdata_cfg": {
                "state_format": "x,y,z,xd,yd,xdd,ydd,h",
                "obs_format": "x,y,z,xd,yd,xdd,ydd,s,c",
            },
        },
    )


def load():
    """Returns a namespace with the reference oracle modules."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name, path in _PARENTS:
        _stub_parent(name, path)

    import numpy as np
    import torch

    # prosim.dataset.data_utils needs trajdata; exec only the functions the
    # oracle paths use out of the real source.
    _ensure_data_utils()

    import prosim.models.utils.geometry as geometry
    import prosim.models.utils.weight_init as weight_init
    import prosim.models.layers.mlp as mlp
    import prosim.models.layers.fourier_embedding as fourier
    import prosim.models.scene_encoder.pointnet_encoder as pointnet
    import prosim.loss.loss_func as loss_func

    ns = types.SimpleNamespace(
        geometry=geometry,
        weight_init=weight_init,
        mlp=mlp,
        fourier=fourier,
        pointnet=pointnet,
        loss_func=loss_func,
        torch=torch,
    )
    return ns


def load_model():
    """Returns a namespace with the reference MODEL modules (scene encoder,
    decoder, policy, prompt encoder, condition transformer, the composed
    ProSim class) plus the data-side formatter/condition modules, all running
    in place via the dependency shims in ref_shims.py.

    reference: prosim/models/traj_sam.py:13-644, scene_encoder/attn_fusion.py,
    decoder/sym_coord.py, policy/act_decoder.py, dataset/format_utils.py.
    """
    import ref_shims

    ref_shims.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name, path in _PARENTS:
        _stub_parent(name, path)

    import numpy as np
    import torch

    _ensure_data_utils()

    from prosim.core.registry import registry as ref_registry
    import prosim.models.layers.attention_layer as attention_layer
    import prosim.models.scene_encoder.attn_fusion as attn_fusion
    import prosim.models.scene_encoder.base as scene_encoder_base
    import prosim.models.decoder.base as decoder_base
    import prosim.models.decoder.sym_coord as sym_coord
    import prosim.models.policy.act_decoder as act_decoder
    import prosim.models.policy.base as policy_base
    import prosim.models.prompt_encoder.base as prompt_encoder_base
    import prosim.models.condition_transformer as condition_transformer
    import prosim.models.traj_sam as traj_sam
    _stub_parent("prosim.config", f"{REF}/prosim/config")
    import prosim.config.default as ref_config
    import prosim.dataset.prompt_utils as prompt_utils
    import prosim.dataset.motion_tag_utils as motion_tag_utils
    import prosim.dataset.condition_utils as condition_utils
    import prosim.dataset.format_utils as format_utils

    return types.SimpleNamespace(
        shims=ref_shims,
        registry=ref_registry,
        attention_layer=attention_layer,
        attn_fusion=attn_fusion,
        scene_encoder_base=scene_encoder_base,
        decoder_base=decoder_base,
        sym_coord=sym_coord,
        act_decoder=act_decoder,
        policy_base=policy_base,
        prompt_encoder_base=prompt_encoder_base,
        condition_transformer=condition_transformer,
        traj_sam=traj_sam,
        prompt_utils=prompt_utils,
        motion_tag_utils=motion_tag_utils,
        condition_utils=condition_utils,
        format_utils=format_utils,
        config=ref_config,
        torch=torch,
    )
