"""Checkpoint management: Orbax for native checkpoints + the PyTorch bridge.

The reference loads 5 torch checkpoints at startup (run_test.py:54-87) and EdgeConnect
saves {name}_gen.pth with an iteration counter (edgeconnect/models.py:43-52). Here:

* ``save`` / ``restore`` — Orbax PyTreeCheckpointer over any param/state tree
  (training resume includes optimizer state, which the reference never saved);
* ``load_torch_checkpoint`` — torch.load a reference .pth (CPU map) and convert via
  models/convert.py; understands EdgeConnect's {"iteration", "generator"} wrapper;
* ``load_reference_model_zoo`` — the full checkpoint directory layout of
  run_test.py:54-87 (cads/model.pth, kpoints/hourglass.pth, icn/256_synth/
  gnet_00020.pth, vunet/256/vunet.pth, inpainting/{Edge,Inpainting}Model_gen.pth).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional


def save(path, tree) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, tree, force=True)


def restore(path, template: Optional[Any] = None):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    checkpointer = ocp.PyTreeCheckpointer()
    if template is not None:
        return checkpointer.restore(path, item=template)
    return checkpointer.restore(path)


def _torch_load(path):
    import torch

    return torch.load(str(path), map_location="cpu", weights_only=False)


def load_torch_checkpoint(
    path,
    convt_keys=(),
    flatten_linear_key=None,
    flatten_linear_chw=None,
    state_dict_key: Optional[str] = None,
):
    """Load + convert a reference .pth. Returns (flax_params, iteration)."""
    from future_urban_scene_generation_tpu.models.convert import convert_state_dict

    data = _torch_load(path)
    iteration = 0
    if isinstance(data, dict) and state_dict_key and state_dict_key in data:
        iteration = int(data.get("iteration", 0))
        data = data[state_dict_key]
    elif isinstance(data, dict) and "generator" in data:
        iteration = int(data.get("iteration", 0))
        data = data["generator"]
    params = convert_state_dict(
        data,
        convt_keys=convt_keys,
        flatten_linear_key=flatten_linear_key,
        flatten_linear_chw=flatten_linear_chw,
    )
    return params, iteration


def load_reference_model_zoo(checkpoints_dir, cache: bool = True) -> Dict[str, Any]:
    """Load every model of the reference checkpoint layout that is present on disk.

    Missing files are skipped (returned dict simply lacks the key) so partial
    checkpoint sets remain usable.

    ``cache=True`` stores the converted trees as an Orbax checkpoint next to the
    .pth files (<checkpoints_dir>/.converted_zoo) and restores from it when it is
    newer than every .pth — torch-load + layout conversion of the full zoo costs
    tens of seconds per process start.
    """
    root = Path(checkpoints_dir)
    cache_dir = root / ".converted_zoo"
    pth_files = list(root.rglob("*.pth"))
    if cache and cache_dir.exists() and pth_files:
        newest_pth = max(p.stat().st_mtime for p in pth_files)
        if cache_dir.stat().st_mtime >= newest_pth:
            try:
                cached = restore(cache_dir)
                if isinstance(cached, dict) and cached:
                    return cached
            except Exception:
                pass  # fall through to a fresh conversion

    zoo = _convert_reference_model_zoo(root)
    if cache and zoo and pth_files:
        try:
            save(cache_dir, zoo)
        except Exception:
            pass  # caching is best-effort
    return zoo


def _convert_reference_model_zoo(checkpoints_dir) -> Dict[str, Any]:
    from future_urban_scene_generation_tpu.models.edgeconnect import (
        EDGECONNECT_CONVT_KEYS,
    )
    from future_urban_scene_generation_tpu.models.vgg import convert_vgg19_classifier

    root = Path(checkpoints_dir)
    zoo: Dict[str, Any] = {}

    cad_path = root / "cads" / "model.pth"
    if cad_path.exists():
        sd = _torch_load(cad_path)
        zoo["cad"] = convert_vgg19_classifier(sd)

    hg_path = root / "kpoints" / "hourglass.pth"
    if hg_path.exists():
        zoo["hourglass"], _ = load_torch_checkpoint(hg_path)

    icn_path = root / "icn" / "256_synth" / "gnet_00020.pth"
    if icn_path.exists():
        zoo["icn"], _ = load_torch_checkpoint(icn_path)

    vunet_path = root / "vunet" / "256" / "vunet.pth"
    if vunet_path.exists():
        zoo["vunet"], _ = load_torch_checkpoint(vunet_path)

    edge_path = root / "inpainting" / "EdgeModel_gen.pth"
    if edge_path.exists():
        zoo["edge"], zoo["edge_iteration"] = load_torch_checkpoint(
            edge_path, convt_keys=EDGECONNECT_CONVT_KEYS
        )

    maskrcnn_path = root / "maskrcnn" / "maskrcnn.pth"
    if maskrcnn_path.exists():
        from future_urban_scene_generation_tpu.models.maskrcnn import convert_maskrcnn

        sd = _torch_load(maskrcnn_path)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        zoo["maskrcnn"] = convert_maskrcnn(sd)

    inpaint_path = root / "inpainting" / "InpaintingModel_gen.pth"
    if inpaint_path.exists():
        zoo["inpaint"], zoo["inpaint_iteration"] = load_torch_checkpoint(
            inpaint_path, convt_keys=EDGECONNECT_CONVT_KEYS
        )

    return zoo
