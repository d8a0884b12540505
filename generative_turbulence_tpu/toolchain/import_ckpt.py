"""Import a reference (turbdiff) PyTorch-Lightning checkpoint into our params.

The reference ships a pretrained checkpoint (``/root/reference/README.md:
197-205``, zenodo ``turbdiff.ckpt``).  Its ``state_dict`` keys follow the
torch module tree of ``DiffusionTraining`` (``turbdiff/models/diffusion.py:
41-137``): ``model.model.*`` is the ``DenoisingModel`` (``turbdiff/models/
ddpm.py:398-505``), ``model.*`` holds the ``GaussianDiffusion`` schedule
buffers, and ``conditioning.cell_type_embedding.*`` the learned cell-type
embedding.  This module maps those tensors onto our flax param pytree:

- torch ``Conv3d`` weight ``(O, I, kx, ky, kz)``  -> flax ``(kx, ky, kz, I, O)``
- torch ``Linear`` weight ``(O, I)``              -> flax ``(I, O)``
- ``GroupNorm`` ``weight``/``bias``               -> ``scale``/``bias``
- ``Embedding`` weight                            -> ``embedding`` (as is)

Everything is plain numpy; torch is only needed by the CLI to unpickle the
``.ckpt`` file (``scripts/import-checkpoint.py``).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional, Tuple

import numpy as np

Array = np.ndarray
Tree = Dict[str, object]

# ResnetBlock field map (reference ddpm.py:180-197 -> models/blocks.py).
_RESNET_FIELDS = {
    "project_onto_scale_shift": ("film", "linear"),
    "block1.conv": ("block1/conv", "conv"),
    "block1.norm": ("block1/norm", "norm"),
    "block2.conv": ("block2/conv", "conv"),
    "block2.norm": ("block2/norm", "norm"),
    "conv": ("skip", "conv"),
}


def _map_resnet(rest: str) -> Tuple[str, str]:
    field, leaf = rest.rsplit(".", 1)
    if field not in _RESNET_FIELDS:
        raise KeyError(f"unknown ResnetBlock field {field!r}")
    path, kind = _RESNET_FIELDS[field]
    return f"{path}.{leaf}", kind


def map_reference_key(key: str, u_net_levels: int) -> Optional[Tuple[str, str]]:
    """Map one reference state_dict key to (our dotted path, tensor kind).

    Returns None for keys that have no parameter counterpart here (diffusion
    schedule buffers, normalization statistics, sample-store state) — those
    are recomputed from config/data on our side.
    """
    if key == "conditioning.cell_type_embedding.embedding.weight":
        # nn.Embedding weight -> our nn.Embed param "embedding", same layout.
        return "conditioning.cell_type_embedding.weight", "embed"
    if key.startswith("normalization.") or key.startswith("val_sample")\
            or key.startswith("test_sample"):
        return None
    if not key.startswith("model.model."):
        # GaussianDiffusion buffers (model.betas, model.alphas_cumprod, ...).
        return None
    k = key[len("model.model."):]
    leaf = k.rsplit(".", 1)[1]

    if k.startswith(("encode_x.", "encode_c_local.")):
        return k, "conv"
    if k.startswith("encode_c_global."):
        return k, "linear"
    m = re.match(r"geometry_embedding\.extract_features\.(\d+)\.(\w+)$", k)
    if m:
        idx = {"0": 0, "2": 1, "4": 2}[m.group(1)]
        return f"geometry_embedding.conv{idx}.{m.group(2)}", "conv"
    if k.startswith("process_c."):
        idx = {"0": 0, "2": 1}[k.split(".")[1]]
        return f"process_c_{idx}.{leaf}", "linear"
    if k.startswith("decode.0."):
        rest, kind = _map_resnet(k[len("decode.0."):])
        return f"decode_resnet.{rest.replace('/', '.')}", kind
    if k.startswith("decode.1."):
        return f"decode_out.{leaf}", "conv"
    m = re.match(r"u_net\.downsampling_blocks\.(\d+)\.(.*)$", k)
    if m:
        rest, kind = _map_resnet(m.group(2))
        return f"u_net.down_{m.group(1)}.{rest.replace('/', '.')}", kind
    m = re.match(r"u_net\.upsampling_blocks\.(\d+)\.(.*)$", k)
    if m:
        # reference applies upsampling_blocks in list order, deepest first
        # (ddpm.py:344-349); ours names them up_{level}, deepest = levels-1.
        level = u_net_levels - 1 - int(m.group(1))
        rest, kind = _map_resnet(m.group(2))
        return f"u_net.up_{level}.{rest.replace('/', '.')}", kind
    m = re.match(r"u_net\.center_block\.(\d+)\.(.*)$", k)
    if m:
        idx, rest = m.group(1), m.group(2)
        if idx == "0":
            sub, kind = _map_resnet(rest)
            return f"u_net.center_in.{sub.replace('/', '.')}", kind
        if idx == "2":
            sub, kind = _map_resnet(rest)
            return f"u_net.center_out.{sub.replace('/', '.')}", kind
        if idx == "1":
            if rest.startswith("fn.norm."):
                return f"u_net.center_norm.{leaf}", "norm"
            if rest.startswith("fn.fn.to_qkv."):
                return f"u_net.center_attention.to_qkv.{leaf}", "conv"
            if rest.startswith("fn.fn.to_out."):
                return f"u_net.center_attention.to_out.{leaf}", "conv"
    raise KeyError(f"unmapped reference key {key!r}")


def _convert_tensor(value: Array, kind: str, leaf: str) -> Tuple[str, Array]:
    value = np.asarray(value)
    if leaf == "bias":
        return "bias", value
    assert leaf == "weight", leaf
    if kind == "conv":
        assert value.ndim == 5, value.shape
        return "kernel", np.transpose(value, (2, 3, 4, 1, 0))
    if kind == "linear":
        assert value.ndim == 2, value.shape
        return "kernel", value.T
    if kind == "norm":
        return "scale", value
    if kind == "embed":
        return "embedding", value
    raise ValueError(kind)


def convert_state_dict(
    state_dict: Mapping[str, Array], u_net_levels: int = 4
) -> Tuple[Tree, Dict[str, Array]]:
    """Convert a reference task state_dict into our flax ``params`` tree.

    Returns ``(params, buffers)`` where ``buffers`` carries the diffusion
    schedule / normalization tensors for cross-validation (betas etc.).
    """
    params: Tree = {}
    buffers: Dict[str, Array] = {}
    for key, value in state_dict.items():
        mapped = map_reference_key(key, u_net_levels)
        if mapped is None:
            buffers[key] = np.asarray(value)
            continue
        path, kind = mapped
        *dirs, torch_leaf = path.split(".")
        leaf, tensor = _convert_tensor(value, kind, torch_leaf)
        node = params
        for d in dirs:
            node = node.setdefault(d, {})
        node[leaf] = tensor
    return params, buffers


def _flatten(tree: Tree, prefix: str = "") -> Dict[str, Array]:
    out: Dict[str, Array] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def check_against(params: Tree, like: Tree) -> None:
    """Raise with a full diff if ``params`` does not structurally match the
    target pytree ``like`` (e.g. from ``jax.eval_shape(model.init, ...)``)."""
    got = _flatten(params)
    want = _flatten(like)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatched = sorted(
        k for k in set(got) & set(want)
        if tuple(np.shape(got[k])) != tuple(want[k].shape)
    )
    if missing or extra or mismatched:
        lines = []
        if missing:
            lines.append("missing (in checkpoint): " + ", ".join(missing))
        if extra:
            lines.append("unexpected (no model param): " + ", ".join(extra))
        if mismatched:
            lines.append(
                "shape mismatch: "
                + ", ".join(
                    f"{k} ckpt{tuple(np.shape(got[k]))} != model{tuple(want[k].shape)}"
                    for k in mismatched
                )
            )
        raise ValueError("checkpoint does not match the model:\n" + "\n".join(lines))
