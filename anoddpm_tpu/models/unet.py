"""Guided-diffusion UNet epsilon-predictor as a Flax module, TPU-first.

Capability-parity rebuild of the reference UNet (reference: UNet.py:220-406,
itself the OpenAI guided-diffusion architecture): ResBlocks with BigGAN-style
in-block up/downsampling, QKV attention at configured resolutions, sinusoidal
timestep embedding with a 2-layer SiLU MLP, GroupNorm(32) always computed in
fp32, zero-initialised output projections.

TPU-native choices:
- NHWC layout throughout (XLA's preferred conv layout on TPU);
- a `dtype` knob: activations/matmuls run in bfloat16 on TPU while params and
  normalisation stay fp32 (mixed precision the MXU way);
- attention as batched einsum over (B, heads, L, ch) — lowered to MXU matmuls;
- shape inference instead of the reference's manual channel bookkeeping.

Structural parity is tested against golden parameter counts extracted from
the reference model (tests/test_unet.py).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Per-resolution channel-multiplier defaults (UNet.py:239-251).
DEFAULT_CHANNEL_MULTS = {
    512: (0.5, 1, 1, 2, 2, 4, 4),
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
    32: (1, 2, 3, 4),
}


def timestep_embedding(t: jax.Array, dim: int, scale: float = 1.0) -> jax.Array:
    """Sinusoidal positional embedding of the timestep, [sin | cos] halves
    (UNet.py:38-57).  Always fp32."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / half))
    angles = t.astype(jnp.float32)[:, None] * scale * freqs[None, :]
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


class GroupNorm32(nn.Module):
    """GroupNorm(32), by default computed in fp32 regardless of activation
    dtype (UNet.py:409-411).

    bf16_path=True keeps the elementwise normalise/scale math in the
    activation dtype (flax still accumulates the mean/variance statistics in
    fp32 internally), eliminating the bf16<->fp32 cast round-trips that the
    train-step trace shows around every norm (BENCHNOTES.md trace table) at
    a tiny precision cost."""
    bf16_path: bool = False

    @nn.compact
    def __call__(self, x):
        if self.bf16_path:
            return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=x.dtype,
                                param_dtype=jnp.float32)(x)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return h.astype(x.dtype)


def _norm_silu(mdl, x, name: str, bf16_norm: bool, pallas: bool):
    """GroupNorm32 + SiLU; with `pallas` and an eligible shape, the fused
    single-pass Pallas kernel (ops/pallas_norm.py — one HBM read + one
    write instead of the unfused two reads + one write).  pallas=False (the
    default) keeps the exact flax composition and parameter tree."""
    if pallas:
        from ..ops import pallas_norm
        if pallas_norm.eligible(x.shape, x.dtype):
            c = x.shape[-1]
            gamma = mdl.param(f"{name}_pscale", nn.initializers.ones,
                              (c,), jnp.float32)
            beta = mdl.param(f"{name}_pbias", nn.initializers.zeros,
                             (c,), jnp.float32)
            return pallas_norm.group_norm_silu(x, gamma, beta)
    return nn.silu(GroupNorm32(bf16_path=bf16_norm, name=name)(x))


def _avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _nearest_up2(x):
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class ResBlock(nn.Module):
    """Residual block with timestep-embedding injection and optional
    BigGAN-style in-block resampling (UNet.py:156-217)."""
    out_channels: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: jnp.dtype = jnp.float32
    bf16_norm: bool = False
    pallas_norm: bool = False

    @nn.compact
    def __call__(self, x, emb, *, deterministic: bool = True):
        conv = lambda feats, kernel, name: nn.Conv(
            feats, kernel, padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        zero_conv = lambda feats, kernel, name: nn.Conv(
            feats, kernel, padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name=name)

        h = _norm_silu(self, x, "norm_in", self.bf16_norm, self.pallas_norm)
        if self.up:
            h = _nearest_up2(h)
            x = _nearest_up2(x)
        elif self.down:
            h = _avg_pool2(h)
            x = _avg_pool2(x)
        h = conv(self.out_channels, (3, 3), "conv_in")(h)

        emb_out = nn.Dense(self.out_channels, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           name="emb_proj")(nn.silu(emb)).astype(h.dtype)
        h = h + emb_out[:, None, None, :]

        h = _norm_silu(self, h, "norm_out", self.bf16_norm, self.pallas_norm)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = zero_conv(self.out_channels, (3, 3), "conv_out")(h)

        if x.shape[-1] != self.out_channels:
            kernel = (3, 3) if self.use_conv_skip else (1, 1)
            x = conv(self.out_channels, kernel, "skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened H*W positions
    (UNet.py:95-153).  Scale 1/sqrt(sqrt(ch)) applied to both q and k;
    softmax in fp32."""
    n_heads: int = 1
    n_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32
    bf16_norm: bool = False

    @nn.compact
    def __call__(self, x):
        b, hgt, wid, c = x.shape
        if self.n_head_channels == -1:
            heads = self.n_heads
        else:
            assert c % self.n_head_channels == 0, (
                f"channels {c} not divisible by n_head_channels "
                f"{self.n_head_channels}")
            heads = c // self.n_head_channels
        ch = c // heads

        h = GroupNorm32(bf16_path=self.bf16_norm,
                        name="norm")(x).reshape(b, hgt * wid, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h)
        qkv = qkv.reshape(b, hgt * wid, heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)          # (B, L, H, ch)

        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum("blhc,bshc->bhls", q * scale, k * scale)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        weights = weights.astype(v.dtype)
        attended = jnp.einsum("bhls,bshc->blhc", weights, v)
        attended = attended.reshape(b, hgt * wid, c)

        proj = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="proj")(attended)
        return x + proj.reshape(b, hgt, wid, c)


class UNet(nn.Module):
    """The epsilon-predicting UNet (UNet.py:220-406).

    Input:  x (B, H, W, C) in the activation dtype or fp32, t (B,) int32.
    Output: eps estimate (B, H, W, C) fp32.
    """
    img_size: int
    base_channels: int
    in_channels: int = 1
    channel_mults: Tuple[float, ...] = ()
    num_res_blocks: int = 2
    dropout: float = 0.0
    attention_resolutions: str = "32,16,8"
    n_heads: int = 1
    n_head_channels: int = -1
    biggan_updown: bool = True
    # TPU-efficiency option (framework addition): run the net on a 2x2 (or
    # s x s) patchified grid — space-to-depth at entry, depth-to-space at
    # exit.  Lossless re-arrangement: eps prediction in patch space is
    # equivalent, but every level has s^2 x fewer spatial positions, and the
    # stem carries s^2 x more channels (better 128-lane utilisation for
    # small base widths).
    space_to_depth: int = 1
    dtype: jnp.dtype = jnp.float32
    # keep GroupNorm's elementwise path in the activation dtype (statistics
    # still accumulate fp32); config key "bf16_norm" — perf knob, off by
    # default for reference-parity numerics
    bf16_norm: bool = False
    # fused single-pass Pallas GroupNorm+SiLU on eligible shapes (config
    # key "pallas_norm"; ops/pallas_norm.py).  Changes the norm parameter
    # names, so only for fresh trainings / perf probes.
    pallas_norm: bool = False

    def _effective_size(self) -> int:
        return self.img_size // self.space_to_depth

    def _mults(self) -> Sequence[float]:
        if self.channel_mults:
            return self.channel_mults
        size = self._effective_size()
        if size not in DEFAULT_CHANNEL_MULTS:
            raise ValueError(f"unsupported image size: {size}")
        return DEFAULT_CHANNEL_MULTS[size]

    def _attention_ds(self):
        # attention_resolutions are true-image resolutions; map onto the
        # patchified grid
        return [self._effective_size() // max(int(r) // self.space_to_depth, 1)
                for r in str(self.attention_resolutions).split(",")]

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        mults = self._mults()
        attention_ds = self._attention_ds()
        base = self.base_channels
        time_dim = base * 4
        cdt = self.dtype

        emb = timestep_embedding(t, base)
        emb = nn.Dense(time_dim, dtype=cdt, param_dtype=jnp.float32,
                       name="time_dense1")(emb.astype(cdt))
        emb = nn.Dense(time_dim, dtype=cdt, param_dtype=jnp.float32,
                       name="time_dense2")(nn.silu(emb))

        in_dtype = x.dtype
        h = x.astype(cdt)
        s2d = self.space_to_depth
        if s2d > 1:
            b, hh, ww, cc = h.shape
            h = h.reshape(b, hh // s2d, s2d, ww // s2d, s2d, cc)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, hh // s2d, ww // s2d, s2d * s2d * cc)
        h = nn.Conv(base, (3, 3), padding="SAME", dtype=cdt,
                    param_dtype=jnp.float32, name="stem")(h)
        skips = [h]

        rb = lambda out_ch, name, **kw: ResBlock(
            out_channels=out_ch, dropout=self.dropout, dtype=cdt,
            bf16_norm=self.bf16_norm, pallas_norm=self.pallas_norm,
            name=name, **kw)
        attn = lambda name: AttentionBlock(
            n_heads=self.n_heads, n_head_channels=self.n_head_channels,
            dtype=cdt, bf16_norm=self.bf16_norm, name=name)

        # --- down path ---
        ds = 1
        for i, mult in enumerate(mults):
            out_ch = int(base * mult)
            for j in range(self.num_res_blocks):
                h = rb(out_ch, f"down_{i}_{j}")(h, emb, deterministic=deterministic)
                if ds in attention_ds:
                    h = attn(f"down_attn_{i}_{j}")(h)
                skips.append(h)
            if i != len(mults) - 1:
                if self.biggan_updown:
                    h = rb(h.shape[-1], f"down_sample_{i}", down=True)(
                        h, emb, deterministic=deterministic)
                else:
                    h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                                padding="SAME", dtype=cdt,
                                param_dtype=jnp.float32,
                                name=f"down_sample_{i}")(h)
                ds *= 2
                skips.append(h)

        # --- middle ---
        mid_ch = h.shape[-1]
        h = rb(mid_ch, "mid_res1")(h, emb, deterministic=deterministic)
        h = attn("mid_attn")(h)
        h = rb(mid_ch, "mid_res2")(h, emb, deterministic=deterministic)

        # --- up path ---
        for i, mult in reversed(list(enumerate(mults))):
            out_ch = int(base * mult)
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = rb(out_ch, f"up_{i}_{j}")(h, emb, deterministic=deterministic)
                if ds in attention_ds:
                    h = attn(f"up_attn_{i}_{j}")(h)
                if i and j == self.num_res_blocks:
                    if self.biggan_updown:
                        h = rb(h.shape[-1], f"up_sample_{i}", up=True)(
                            h, emb, deterministic=deterministic)
                    else:
                        h = _nearest_up2(h)
                        h = nn.Conv(h.shape[-1], (3, 3), padding="SAME",
                                    dtype=cdt, param_dtype=jnp.float32,
                                    name=f"up_sample_{i}")(h)
                    ds //= 2
        assert not skips

        h = h.astype(in_dtype)
        h = _norm_silu(self, h, "out_norm", self.bf16_norm,
                       self.pallas_norm)
        out_feats = self.in_channels * s2d * s2d
        h = nn.Conv(out_feats, (3, 3), padding="SAME",
                    dtype=jnp.float32, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="out_conv")(h)
        if s2d > 1:
            b, hh, ww, _ = h.shape
            h = h.reshape(b, hh, ww, s2d, s2d, self.in_channels)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, hh * s2d, ww * s2d, self.in_channels)
        return h.astype(jnp.float32)


def unet_from_args(args, in_channels: int, dtype=None) -> UNet:
    """Build the UNet from an args{N}.json config (train driver contract,
    diffusion_training.py:40-44)."""
    if dtype is None:
        name = str(args.get("compute_dtype", "bfloat16") or "bfloat16")
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]
    img_size = args["img_size"][0] if isinstance(args["img_size"], (tuple, list)) \
        else int(args["img_size"])
    mults = args.get("channel_mults", "")
    if isinstance(mults, str):
        mults = tuple(int(s) for s in mults.replace(",", " ").split())
    elif mults is None:
        mults = ()
    else:
        mults = tuple(int(m) for m in mults)
    return UNet(
        img_size=int(img_size),
        base_channels=int(args["base_channels"]),
        in_channels=in_channels,
        channel_mults=mults,
        dropout=float(args.get("dropout", 0) or 0),
        attention_resolutions=str(args.get("attention_resolutions") or "32,16,8"),
        n_heads=int(args.get("num_heads", 1) or 1),
        n_head_channels=int(args.get("num_head_channels", -1) or -1),
        space_to_depth=int(args.get("space_to_depth", 1) or 1),
        bf16_norm=bool(args.get("bf16_norm")),
        pallas_norm=bool(args.get("pallas_norm")),
        dtype=dtype,
    )
