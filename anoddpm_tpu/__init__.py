"""anoddpm-tpu: a TPU-native (JAX/XLA/Pallas) anomaly-detection framework.

Re-implements the full capability surface of AnoDDPM (Julian-Wyatt/AnoDDPM):
partial-diffusion anomaly detection with multi-octave simplex noise — as a
pure-functional JAX framework designed for TPU:

- diffusion math as stateless functions over a `Schedule` pytree
  (`anoddpm_tpu.schedule`, `anoddpm_tpu.diffusion`),
- the guided-diffusion UNet as a Flax module in NHWC layout
  (`anoddpm_tpu.models.unet`),
- on-device, fully-vectorised OpenSimplex octave noise
  (`anoddpm_tpu.ops.simplex`) replacing the reference's host-side Numba
  kernels (reference: simplex.py),
- keyed, deterministic noise sources (`anoddpm_tpu.ops.noise`),
- data-parallel training over a `jax.sharding.Mesh`
  (`anoddpm_tpu.parallel`),
- the numbered args{N}.json experiment-config interface
  (`anoddpm_tpu.config`, reference: test_args/ + helpers.py).
"""

__version__ = "0.1.0"
