"""Mechanical PyTorch state-dict -> Flax params converter.

Every Flax model in this framework names its submodules after the reference torch
module path with Sequential/ModuleList indices fused into the name ("model.3" ->
"model_3", "hg.0.hg.0.0.0" -> "hg_0" / "hg_0_0_0"). That makes conversion a pure
key-rewriting walk — no per-model mapping tables:

* conv weight (4D)          -> "kernel", OIHW -> HWIO
* conv-transpose weight     -> "kernel", (in,out,kh,kw) -> (kh,kw,in,out)
  (keys listed in ``convt_keys`` — shape alone can't distinguish them)
* linear weight (2D)        -> "kernel", transposed; an optional CHW->HWC flatten
  permutation for the first linear after a conv stack
* batch/instance norm       -> gamma/beta/running_mean/running_var
* weight_norm (weight_v/_g) -> v (transposed) / g (flattened)
* spectral norm             -> folded: W = W_orig / (u . W_mat v)  — torch's eval-mode
  weight with the stored power-iteration vectors (utils of edgeconnect/networks.py:206)
* num_batches_tracked       -> dropped

Reference checkpoint names this converter accepts are the exact state-dict keys of
run_test.py:24-89's model zoo (hourglass.pth, gnet_00020.pth, vunet.pth,
EdgeModel_gen.pth, InpaintingModel_gen.pth, cads/model.pth).
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def fold_spectral_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Replace (weight_orig, weight_u, weight_v) triples with torch's eval-mode
    effective weight: sigma = u . (W_mat @ v), W = W_orig / sigma."""
    out = dict(sd)
    for key in list(sd.keys()):
        if not key.endswith("weight_orig"):
            continue
        prefix = key[: -len("weight_orig")]
        w = _to_numpy(sd[key]).astype(np.float64)
        u = _to_numpy(sd[prefix + "weight_u"]).astype(np.float64)
        v = _to_numpy(sd[prefix + "weight_v"]).astype(np.float64)
        # torch reshapes with the normalized dim first: dim=0 for Conv2d/Linear,
        # dim=1 for ConvTranspose2d. Recover the dim from u's length.
        if u.size == w.shape[0]:
            w_mat = w.reshape(w.shape[0], -1)
        elif w.ndim >= 2 and u.size == w.shape[1]:
            w_mat = np.moveaxis(w, 1, 0).reshape(w.shape[1], -1)
        else:
            raise ValueError(f"cannot infer spectral-norm dim for {key}: {w.shape} vs u {u.shape}")
        sigma = float(u @ (w_mat @ v))
        out[prefix + "weight"] = (w / sigma).astype(np.float32)
        del out[key]
        del out[prefix + "weight_u"]
        del out[prefix + "weight_v"]
    return out


def _merge_path(parts: Sequence[str]) -> Tuple[str, ...]:
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = merged[-1] + "_" + p
        else:
            merged.append(p)
    return tuple(merged)


def _insert(tree: dict, path: Tuple[str, ...], leaf_name: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def _lookup(tree: dict, path: Tuple[str, ...], leaf_name: str):
    node = tree
    for p in path:
        if p not in node:
            raise KeyError(f"flax params missing module {'/'.join(path)}")
        node = node[p]
    if leaf_name not in node:
        raise KeyError(f"flax params missing leaf {'/'.join(path)}/{leaf_name}")
    return np.asarray(node[leaf_name])


def export_state_dict(
    params: dict,
    template: Dict[str, Sequence[int]],
    convt_keys: Iterable[str] = (),
    flatten_linear_key: Optional[str] = None,
    flatten_linear_chw: Optional[Tuple[int, int, int]] = None,
) -> Dict[str, np.ndarray]:
    """The exact inverse of :func:`convert_state_dict`: flax params -> a torch
    state dict with the reference's key names and layouts, so weights trained in
    this framework drop into the reference's own ``load_state_dict`` calls
    (run_test.py:24-89, edgeconnect/models.py:20-52).

    ``template`` maps every torch key the target architecture expects to its
    tensor shape (see tools/gen_zoo_template.py — generated from the reference's
    real networks). Spectral-norm triples (``weight_orig``/``weight_u``/
    ``weight_v``) are reconstituted from the folded flax kernel W by choosing a
    random unit v and u = Wv / |Wv|^2, which makes the stored sigma
    u . (W_mat v) exactly 1 — both torch's eval-mode forward and
    :func:`fold_spectral_norm` then recover W bit-for-bit.
    """
    convt_keys = set(convt_keys)
    tree = params.get("params", params)
    bn_prefixes = {k[: -len("running_mean")] for k in template
                   if k.endswith("running_mean")}
    sn_prefixes = {k[: -len("weight_orig")] for k in template
                   if k.endswith("weight_orig")}
    out: Dict[str, np.ndarray] = {}

    for key in template:
        shape = tuple(int(s) for s in template[key])
        parts = key.split(".")
        leaf = parts[-1]
        path = _merge_path(parts[:-1])
        module_prefix = key[: -len(leaf)] if leaf else key

        if leaf == "num_batches_tracked":
            out[key] = np.asarray(0, np.int64)
            continue
        if leaf in ("weight_u", "weight_v") and module_prefix in sn_prefixes:
            continue  # emitted alongside weight_orig below
        if leaf == "weight_orig":
            w_flax = _lookup(tree, path, "kernel")
            if module_prefix + "weight" in convt_keys or key in convt_keys:
                w = w_flax.transpose(2, 3, 0, 1)  # (kh,kw,in,out)->(in,out,kh,kw)
                w_mat = np.moveaxis(w, 1, 0).reshape(w.shape[1], -1)  # torch dim=1
            else:
                w = w_flax.transpose(3, 2, 0, 1)  # HWIO -> OIHW
                w_mat = w.reshape(w.shape[0], -1)
            rs = np.random.RandomState(abs(hash(key)) % (2**31))
            v = rs.randn(w_mat.shape[1]).astype(np.float64)
            v /= np.linalg.norm(v)
            z = w_mat.astype(np.float64) @ v
            u = z / float(z @ z)  # => u . (W_mat v) == 1, sigma == 1
            out[key] = w.astype(np.float32)
            out[module_prefix + "weight_u"] = u.astype(np.float32)
            out[module_prefix + "weight_v"] = v.astype(np.float32)
            continue
        if leaf == "weight":
            if module_prefix in bn_prefixes:
                out[key] = _lookup(tree, path, "gamma")
            elif len(shape) == 4:
                k_flax = _lookup(tree, path, "kernel")
                if key in convt_keys:
                    out[key] = k_flax.transpose(2, 3, 0, 1)
                else:
                    out[key] = k_flax.transpose(3, 2, 0, 1)
            elif len(shape) == 2:
                arr = _lookup(tree, path, "kernel").T
                if key == flatten_linear_key:
                    c, h, w = flatten_linear_chw
                    arr = arr.reshape(arr.shape[0], h, w, c).transpose(0, 3, 1, 2)
                    arr = arr.reshape(arr.shape[0], -1)
                out[key] = arr
            else:
                out[key] = _lookup(tree, path, "weight")
        elif leaf == "bias":
            name = "beta" if module_prefix in bn_prefixes else "bias"
            out[key] = _lookup(tree, path, name)
        elif leaf in ("running_mean", "running_var"):
            out[key] = _lookup(tree, path, leaf)
        elif leaf == "weight_v":  # weight norm (no weight_orig sibling)
            out[key] = _lookup(tree, path, "v").transpose(3, 2, 0, 1)
        elif leaf == "weight_g":
            out[key] = _lookup(tree, path, "g").reshape(shape)
        else:
            out[key] = _lookup(tree, path, leaf)
        if tuple(out[key].shape) != shape:
            raise ValueError(
                f"exported {key} has shape {out[key].shape}, template wants {shape}"
            )
    return {k: np.ascontiguousarray(np.asarray(v, np.float32))
            if np.asarray(v).dtype != np.int64 else v
            for k, v in out.items()}


def convert_state_dict(
    sd: Dict[str, object],
    convt_keys: Iterable[str] = (),
    flatten_linear_key: Optional[str] = None,
    flatten_linear_chw: Optional[Tuple[int, int, int]] = None,
    prefix_strip: str = "",
) -> dict:
    """Convert a torch state dict into a flax ``{"params": ...}`` tree.

    convt_keys: torch keys (of the ``.weight`` entries) that belong to ConvTranspose2d
    modules. flatten_linear_key: the ``.weight`` key of the linear that consumes a
    flattened conv feature map; its input permutes from torch's (C, H, W) flatten order
    to our (H, W, C), with ``flatten_linear_chw`` giving that (C, H, W).
    """
    convt_keys = set(convt_keys)
    sd = fold_spectral_norm({k: v for k, v in sd.items()})
    params: dict = {}
    # Detect batch-norm prefixes: any module that has a running_mean.
    bn_prefixes = {k[: -len("running_mean")] for k in sd if k.endswith("running_mean")}

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if prefix_strip and key.startswith(prefix_strip):
            key_eff = key[len(prefix_strip):]
        else:
            key_eff = key
        arr = _to_numpy(val)
        parts = key_eff.split(".")
        leaf = parts[-1]
        path = _merge_path(parts[:-1])
        module_prefix = key[: -(len(leaf))]

        if leaf == "weight":
            if module_prefix in bn_prefixes:
                _insert(params, path, "gamma", arr)
            elif arr.ndim == 4:
                if key in convt_keys:
                    _insert(params, path, "kernel", arr.transpose(2, 3, 0, 1))
                else:
                    _insert(params, path, "kernel", arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                if key == flatten_linear_key:
                    c, h, w = flatten_linear_chw
                    arr = arr.reshape(arr.shape[0], c, h, w).transpose(0, 2, 3, 1)
                    arr = arr.reshape(arr.shape[0], -1)
                _insert(params, path, "kernel", arr.T)
            else:
                # 1D weight that's not BN: PReLU slope etc.
                _insert(params, path, "weight", arr)
        elif leaf == "bias":
            if module_prefix in bn_prefixes:
                _insert(params, path, "beta", arr)
            else:
                _insert(params, path, "bias", arr)
        elif leaf in ("running_mean", "running_var"):
            _insert(params, path, leaf, arr)
        elif leaf == "weight_v":
            _insert(params, path, "v", arr.transpose(2, 3, 1, 0))
        elif leaf == "weight_g":
            _insert(params, path, "g", arr.reshape(-1))
        else:
            _insert(params, path, leaf, arr)

    return {"params": params}
