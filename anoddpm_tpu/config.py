"""Experiment configuration: numbered JSON args files.

Mirrors the reference's config contract (reference: helpers.py:19-23,
diffusion_training.py:286-301): experiments are described by
``configs/args{N}.json`` files; any key not present in the file resolves to
``""`` (the reference uses ``defaultdict(str)``), and the experiment number is
injected as ``args["arg_num"]``.  CLI accepts ``28``, ``args28`` or
``args28.json``.

On top of that contract this framework adds TPU-specific keys (all optional,
all defaulting to sane values): ``compute_dtype``, ``mesh`` (data-parallel
device count spec), ``seed``.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Any, Dict


# Keys the reference's shipped configs use (test_args/args28.json:1-29) plus
# framework extensions. `validate_args` warns on anything else: because
# missing keys silently resolve to "" (defaultdict-str semantics), a typo'd
# key would otherwise change behaviour without any signal.
KNOWN_KEYS = {
    "img_size", "Batch_Size", "EPOCHS", "T", "base_channels", "beta_schedule",
    "channel_mults", "loss-type", "loss_weight", "train_start", "lr",
    "random_slice", "sample_distance", "weight_decay", "save_imgs",
    "save_vids", "dropout", "attention_resolutions", "num_heads",
    "num_head_channels", "noise_fn", "dataset", "channels", "arg_num",
    # framework extensions
    "compute_dtype", "seed", "mesh", "num_res_blocks", "iters_per_epoch",
    "simplex_octaves", "simplex_persistence", "simplex_frequency",
    "simplex_table",
    "checkpoint_every", "ema_decay", "grad_clip_norm",
    "train_substeps", "sampler", "ddim_steps", "ddim_eta", "space_to_depth",
    "bf16_norm", "lesion_kind", "lesion_severity", "recon_repeats",
    "anomalous_volumes",
    "_note",  # free-form provenance comment in shipped configs
}

DEFAULTS: Dict[str, Any] = {
    "compute_dtype": "bfloat16",
    "seed": 0,
    "ema_decay": 0.9999,
    "grad_clip_norm": 1.0,
    "simplex_octaves": 6,
    "simplex_persistence": 0.8,
    "simplex_frequency": 64,
    "checkpoint_every": 1000,
}


def defaultdict_from_json(json_dict: Dict[str, Any]) -> "defaultdict[str, Any]":
    """Missing keys resolve to "" — the reference's semantics (helpers.py:19-23)."""
    dd: "defaultdict[str, Any]" = defaultdict(str)
    dd.update(json_dict)
    return dd


def normalise_arg_token(token: str) -> str:
    """'28' | 'args28' | 'args28.json' -> '28' (diffusion_training.py:286-295)."""
    if token.endswith(".json"):
        token = token[:-5]
    if token.startswith("args"):
        token = token[4:]
    return token


def validate_args(raw: Dict[str, Any], source: str = "") -> list:
    """Warn about keys no component reads.  Unknown keys still pass through
    untouched — this only surfaces likely typos, which the defaultdict-str
    contract would otherwise swallow (a misspelled key means the intended one
    silently resolves to "")."""
    import warnings
    unknown = sorted(k for k in raw if k not in KNOWN_KEYS)
    for k in unknown:
        warnings.warn(f"unknown config key {k!r}{' in ' + source if source else ''}"
                      f" — no component reads it (missing keys default to \"\")",
                      stacklevel=2)
    return unknown


def load_args(token: str, config_dir: str = "configs") -> "defaultdict[str, Any]":
    """Load args{N}.json by experiment token, injecting arg_num and defaults."""
    arg_num = normalise_arg_token(str(token))
    path = os.path.join(config_dir, f"args{arg_num}.json")
    with open(path, "r") as f:
        raw = json.load(f)
    validate_args(raw, source=path)
    args = defaultdict_from_json(raw)
    args["arg_num"] = arg_num
    for k, v in DEFAULTS.items():
        if k not in raw:
            args[k] = v
    # img_size is a [H, W] list in JSON; keep as tuple internally.
    if args["img_size"] != "":
        args["img_size"] = tuple(args["img_size"])
    return args


def resolve_in_channels(args: Dict[str, Any]) -> int:
    """Channel count by dataset (diffusion_training.py:33-37)."""
    in_channels = 1
    ds = str(args.get("dataset", "")).lower()
    if ds in ("cifar", "leather"):
        in_channels = 3
    if args.get("channels", "") != "":
        in_channels = int(args["channels"])
    return in_channels
