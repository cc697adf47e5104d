"""Checkpoint save/load with the reference's "args travel inside the
checkpoint" contract (reference: diffusion_training.py:156-189,
helpers.py:26-93).

Layout (mirrors the reference artifact tree keyed by ARGS={n}):

    model/diff-params-ARGS={n}/params-final/          final save
    model/diff-params-ARGS={n}/checkpoint/diff_epoch={e}/   periodic saves

Each checkpoint directory holds:
    payload.msgpack   flax-serialised {"model", "ema", "opt"} pytrees
    meta.json         {"n_epoch", "args", "loss"}

Resume semantics match the reference: RESUME_RECENT scans checkpoints
newest-first and skips corrupt ones (diffusion_training.py:363-377,
helpers.py:36-45); RESUME_FINAL loads params-final; evaluation recovers args
from inside the checkpoint (helpers.py:79-88).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import flax.serialization


def _args_dir(root: str, arg_num) -> str:
    return os.path.join(root, "model", f"diff-params-ARGS={arg_num}")


def _write(path: str, payload: Dict[str, Any], meta: Dict[str, Any]) -> None:
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "payload.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, default=_jsonable)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def _jsonable(o):
    if isinstance(o, (tuple, set)):
        return list(o)
    try:
        return o.item()
    except AttributeError:
        return str(o)


def save_checkpoint(root: str, args: Dict[str, Any], epoch: int, params, ema,
                    opt_state, final: bool = False, loss: float = 0.0) -> str:
    """Save a checkpoint (diffusion_training.py:156-189 contract)."""
    base = _args_dir(root, args["arg_num"])
    payload = {"model": params, "ema": ema, "opt": opt_state}
    meta = {"n_epoch": int(epoch), "args": dict(args), "loss": float(loss)}
    if final:
        path = os.path.join(base, "params-final")
    else:
        path = os.path.join(base, "checkpoint", f"diff_epoch={epoch}")
    _write(path, payload, meta)
    return path


def _read(path: str, target_payload) -> Tuple[Any, Dict[str, Any]]:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "payload.msgpack"), "rb") as f:
        raw = f.read()
    if target_payload is None:
        payload = flax.serialization.msgpack_restore(raw)
    else:
        payload = flax.serialization.from_bytes(target_payload, raw)
    return payload, meta


def latest_checkpoint_path(root: str, arg_num) -> Optional[str]:
    """Newest checkpoint directory, or None (diffusion_training.py:363-368)."""
    ckpt_dir = os.path.join(_args_dir(root, arg_num), "checkpoint")
    if not os.path.isdir(ckpt_dir):
        return None
    entries = []
    for name in os.listdir(ckpt_dir):
        m = re.match(r"diff_epoch=(\d+)$", name)
        if m:
            entries.append((int(m.group(1)), name))
    entries.sort(reverse=True)
    return os.path.join(ckpt_dir, entries[0][1]) if entries else None


def load_checkpoint(root: str, arg_num, use_checkpoint: bool = False,
                    target_payload=None) -> Tuple[Any, Dict[str, Any]]:
    """Load the final model, or (use_checkpoint) the newest NON-CORRUPT
    checkpoint — corrupt ones are skipped, as in the reference
    (helpers.py:26-45)."""
    base = _args_dir(root, arg_num)
    if not use_checkpoint:
        return _read(os.path.join(base, "params-final"), target_payload)
    ckpt_dir = os.path.join(base, "checkpoint")
    entries = sorted(
        ((int(m.group(1)), n) for n in os.listdir(ckpt_dir)
         if (m := re.match(r"diff_epoch=(\d+)$", n))),
        reverse=True)
    last_err: Optional[Exception] = None
    for _, name in entries:
        try:
            return _read(os.path.join(ckpt_dir, name), target_payload)
        except Exception as e:  # corrupt checkpoint: try the next-newest
            last_err = e
            continue
    raise FileNotFoundError(
        f"no loadable checkpoint under {ckpt_dir}") from last_err


def purge_checkpoints(root: str, arg_num) -> None:
    """Delete the periodic-checkpoint dir after the final save
    (diffusion_training.py:382-385)."""
    ckpt_dir = os.path.join(_args_dir(root, arg_num), "checkpoint")
    if os.path.isdir(ckpt_dir):
        shutil.rmtree(ckpt_dir)


def load_parameters(root: str, token: str, use_checkpoint: bool = False,
                    target_payload=None):
    """Args + payload for the detection/eval drivers, with args recovered
    from inside the checkpoint (helpers.py:48-93)."""
    from .config import defaultdict_from_json, normalise_arg_token
    arg_num = normalise_arg_token(str(token))
    payload, meta = load_checkpoint(root, arg_num, use_checkpoint,
                                    target_payload)
    args = defaultdict_from_json(meta["args"])
    args["arg_num"] = arg_num
    if args["img_size"] != "":
        args["img_size"] = tuple(args["img_size"])
    if "noise_fn" not in meta["args"]:
        args["noise_fn"] = "gauss"
    return args, payload, meta
