"""FLOPs arithmetic for the strict-protocol ceiling proof (round-4 VERDICT
item 4): measure the UNet forward cost from XLA's own cost model, derive the
FLOPs of one full reverse chain at the reference's headline protocol
(lambda=200/250 DDPM, detection.py:223-227), and the provable maximum
slices/sec/chip at 100% MFU on this chip's bf16 peak.

Writes results/chain_flops.json and prints it.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

BF16_PEAK_TFLOPS = 197.0  # v5e chip peak


def unet_fwd_flops(batch, base, s2d=1, img=256):
    from anoddpm_tpu.models.unet import UNet
    model = UNet(img_size=img, base_channels=base, in_channels=1,
                 attention_resolutions="16,8", n_heads=2,
                 space_to_depth=s2d, bf16_norm=True, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, img, img, 1))
    t = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t)
    fwd = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt))
    flops = fwd.lower(params, x, t).compile().cost_analysis()["flops"]
    return float(flops)


def main():
    out = {"peak_tflops_bf16": BF16_PEAK_TFLOPS}
    for name, (batch, base, s2d) in {
            "paper_b8": (8, 128, 1),       # args28 architecture, batch 8
            "headline_b32_s2d": (32, 64, 2)}.items():
        f = unet_fwd_flops(batch, base, s2d)
        per_img = f / batch
        row = {"batch": batch, "base_channels": base, "s2d": s2d,
               "fwd_flops_per_img": per_img,
               "fwd_tflop_per_img": per_img / 1e12}
        for steps, label in ((250, "ddpm250"), (200, "ddpm200"),
                             (15, "ddim15")):
            chain = per_img * steps
            row[f"{label}_tflop_per_slice"] = chain / 1e12
            # 100% MFU ceiling: every FLOP of the chain on the MXU at peak
            row[f"{label}_max_slices_per_sec_100mfu"] = (
                BF16_PEAK_TFLOPS * 1e12 / chain)
        out[name] = row
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "chain_flops.json")
    with open(path, "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
