"""Import reference (PyTorch) UNet checkpoints into the Flax model.

Lets a user of the reference bring trained weights (`params-final.pt`
state_dicts, diffusion_training.py:168-177) into this framework.  The
mapping replicates the reference's module construction order (UNet.py:
278-388) against this framework's named modules, converting layouts:

- Conv2d weight (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
- Conv1d weight (O, I, 1)       -> Dense kernel (I, O)
- Linear weight (O, I)          -> Dense kernel (I, O)
- GroupNorm weight/bias         -> GroupNorm scale/bias

The QKV head layout is identical by construction (head-major channel
blocks, q|k|v within each head), so attention weights transpose directly.

Works on plain dict state_dicts (tensors or numpy arrays) — torch is only
needed to `torch.load` the file, not for the conversion.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

from ..models.unet import DEFAULT_CHANNEL_MULTS


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _conv(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{prefix}.bias"])}


def _dense_from_conv1d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])[..., 0]  # (O, I)
    return {"kernel": w.T, "bias": _np(sd[f"{prefix}.bias"])}


def _dense(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _gn(sd, prefix):
    return {"GroupNorm_0": {"scale": _np(sd[f"{prefix}.weight"]),
                            "bias": _np(sd[f"{prefix}.bias"])}}


def _resblock(sd, prefix, has_skip: bool):
    out = {
        "norm_in": _gn(sd, f"{prefix}.in_layers.0"),
        "conv_in": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _dense(sd, f"{prefix}.embed_layers.1"),
        "norm_out": _gn(sd, f"{prefix}.out_layers.0"),
        "conv_out": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if has_skip:
        out["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _attention(sd, prefix):
    return {
        "norm": _gn(sd, f"{prefix}.norm"),
        "qkv": _dense_from_conv1d(sd, f"{prefix}.to_qkv"),
        "proj": _dense_from_conv1d(sd, f"{prefix}.proj_out"),
    }


def import_reference_unet_state(state_dict: Dict[str, Any], img_size: int,
                                base_channels: int,
                                channel_mults: Sequence[float] = (),
                                num_res_blocks: int = 2,
                                attention_resolutions: str = "32,16,8",
                                in_channels: int = 1) -> Dict[str, Any]:
    """Reference UNet state_dict -> flax params {'params': {...}}."""
    sd = state_dict
    mults = tuple(channel_mults) or DEFAULT_CHANNEL_MULTS[img_size]
    attention_ds = [img_size // int(r)
                    for r in str(attention_resolutions).split(",")]
    base = base_channels
    p: Dict[str, Any] = {}

    p["time_dense1"] = _dense(sd, "time_embedding.1")
    p["time_dense2"] = _dense(sd, "time_embedding.3")
    p["stem"] = _conv(sd, "down.0.0")

    def res_has_skip(in_ch, out_ch):
        return in_ch != out_ch

    # --- down path (mirrors UNet.py:278-325) ---
    t_idx = 1  # torch down-list index
    ch = int(mults[0] * base)
    chans = [ch]
    ds = 1
    for i, mult in enumerate(mults):
        out_ch = int(base * mult)
        for j in range(num_res_blocks):
            prefix = f"down.{t_idx}"
            p[f"down_{i}_{j}"] = _resblock(sd, f"{prefix}.0",
                                           res_has_skip(ch, out_ch))
            ch = out_ch
            if ds in attention_ds:
                p[f"down_attn_{i}_{j}"] = _attention(sd, f"{prefix}.1")
            chans.append(ch)
            t_idx += 1
        if i != len(mults) - 1:
            p[f"down_sample_{i}"] = _resblock(sd, f"down.{t_idx}.0", False)
            ds *= 2
            chans.append(ch)
            t_idx += 1

    # --- middle (UNet.py:327-343) ---
    p["mid_res1"] = _resblock(sd, "middle.0", False)
    p["mid_attn"] = _attention(sd, "middle.1")
    p["mid_res2"] = _resblock(sd, "middle.2", False)

    # --- up path (UNet.py:346-382) ---
    t_idx = 0
    for i, mult in reversed(list(enumerate(mults))):
        out_ch = int(base * mult)
        for j in range(num_res_blocks + 1):
            prefix = f"up.{t_idx}"
            in_ch = ch + chans.pop()
            sub = 0
            p[f"up_{i}_{j}"] = _resblock(sd, f"{prefix}.{sub}",
                                         res_has_skip(in_ch, out_ch))
            ch = out_ch
            sub += 1
            if ds in attention_ds:
                p[f"up_attn_{i}_{j}"] = _attention(sd, f"{prefix}.{sub}")
                sub += 1
            if i and j == num_res_blocks:
                p[f"up_sample_{i}"] = _resblock(sd, f"{prefix}.{sub}", False)
                ds //= 2
            t_idx += 1

    p["out_norm"] = _gn(sd, "out.0")
    p["out_conv"] = _conv(sd, "out.2")
    return {"params": p}


def load_reference_checkpoint(path: str, img_size: int, base_channels: int,
                              use_ema: bool = True, **kwargs):
    """Load a reference params-final.pt and convert (requires torch)."""
    import torch
    payload = torch.load(path, map_location="cpu")
    sd = payload["ema"] if use_ema and "ema" in payload \
        else payload["model_state_dict"]
    return import_reference_unet_state(sd, img_size, base_channels, **kwargs)
