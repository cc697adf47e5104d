"""Output-level equivalence: reference torch UNet vs this framework's Flax
UNet with imported weights.  The strongest architecture-parity test — skipped
when the reference repo is not mounted."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("cfg", [
    dict(img_size=32, base_channels=32, in_channels=1, n_heads=1,
         attention_resolutions="16,8"),
    dict(img_size=64, base_channels=32, in_channels=1, n_heads=2,
         attention_resolutions="16,8"),
])
def test_flax_unet_matches_reference_outputs(cfg):
    sys.path.insert(0, REFERENCE)
    from UNet import UNetModel as TorchUNet

    import jax
    import jax.numpy as jnp
    from anoddpm_tpu.compat import import_reference_unet_state
    from anoddpm_tpu.models.unet import UNet

    torch.manual_seed(0)
    tmodel = TorchUNet(cfg["img_size"], cfg["base_channels"],
                       in_channels=cfg["in_channels"],
                       n_heads=cfg["n_heads"],
                       attention_resolutions=cfg["attention_resolutions"])
    tmodel.eval()
    # perturb the zero-init layers so the comparison is non-trivial
    with torch.no_grad():
        for name, par in tmodel.named_parameters():
            if par.abs().sum() == 0:
                par.add_(torch.randn_like(par) * 0.05)

    sd = tmodel.state_dict()
    params = import_reference_unet_state(
        sd, cfg["img_size"], cfg["base_channels"],
        attention_resolutions=cfg["attention_resolutions"],
        in_channels=cfg["in_channels"])

    fmodel = UNet(img_size=cfg["img_size"], base_channels=cfg["base_channels"],
                  in_channels=cfg["in_channels"], n_heads=cfg["n_heads"],
                  attention_resolutions=cfg["attention_resolutions"])

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, cfg["img_size"], cfg["img_size"],
                         cfg["in_channels"])).astype(np.float32)
    for t_val in (0, 5, 27):
        t = np.full((2,), t_val, np.int64)
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
        f_out = np.asarray(jax.jit(fmodel.apply)(
            params, jnp.asarray(x), jnp.asarray(t, jnp.int32)))
        np.testing.assert_allclose(f_out, t_out, atol=2e-4, rtol=1e-3)
