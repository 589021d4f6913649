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
    ("prosim.models", f"{REF}/prosim/models"),
    ("prosim.models.utils", f"{REF}/prosim/models/utils"),
    ("prosim.models.layers", f"{REF}/prosim/models/layers"),
    ("prosim.models.scene_encoder", f"{REF}/prosim/models/scene_encoder"),
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


def load():
    """Returns a namespace with the reference oracle modules."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name, path in _PARENTS:
        _stub_parent(name, path)

    import numpy as np
    import torch

    # prosim.dataset.data_utils needs trajdata; loss_func only uses its
    # `rotate` - exec exactly that function out of the real source.
    if "prosim.dataset.data_utils" not in sys.modules:
        _exec_functions_from(
            f"{REF}/prosim/dataset/data_utils.py",
            "prosim.dataset.data_utils",
            ["rotate"],
            glb={"torch": torch, "np": np},
        )

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
