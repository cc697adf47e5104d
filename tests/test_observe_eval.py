"""Observability utilities + test-set evaluation suite (C15) on CPU."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from anoddpm_tpu.config import defaultdict_from_json
from anoddpm_tpu.data.pipeline import batch_iterator
from anoddpm_tpu.data.synthetic import SyntheticMRIDataset
from anoddpm_tpu.evaluation import testing as eval_testing
from anoddpm_tpu.models.unet import UNet
from anoddpm_tpu.observe import MetricsLogger, StepTimer
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
from anoddpm_tpu.training import EvalModel


def test_metrics_logger_jsonl(tmp_path):
    path = os.path.join(str(tmp_path), "m.jsonl")
    log = MetricsLogger(path)
    log.log(1, loss=0.5, note="a")
    log.log(2, loss=jnp.float32(0.25))
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["loss"] == 0.25
    assert "wall_time" in lines[0]


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(5):
        t.tick()
    assert t.count == 4
    assert np.isfinite(t.mean)


def test_evaluation_testing_suite(tmp_path):
    img = 32
    model = UNet(img_size=img, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, img, img, 1)),
                                 jnp.zeros((1,), jnp.int32))
    em = EvalModel(model, params)
    sched = make_schedule(get_beta_schedule(10, "cosine"))
    args = defaultdict_from_json({
        "arg_num": "evaltest", "img_size": (img, img),
        "sample_distance": 8, "Batch_Size": 2})
    ds = SyntheticMRIDataset(img_size=(img, img), length=8)
    it = batch_iterator(ds, 2, shuffle=False)
    results = eval_testing(it, em, sched, args, root_dir=str(tmp_path),
                           n_images=2, save_videos=False)
    for k in ("total_vlb", "prior_vlb", "psnr", "mse_at_200"):
        assert np.isfinite(results[k]), k
    assert os.path.exists(os.path.join(str(tmp_path), "metrics",
                                       "argsevaltest-test.json"))


def test_evaluation_vlb_batch_mean_flag(tmp_path):
    """args["vlb_batch_mean"] widens the t=200 VLB statistics from batch
    element [0] (reference-faithful, evaluation.py:175-185) to the batch
    mean (VERDICT r3 weak #7) — same suite, different reduction."""
    img = 32
    model = UNet(img_size=img, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, img, img, 1)),
                                 jnp.zeros((1,), jnp.int32))
    em = EvalModel(model, params)
    sched = make_schedule(get_beta_schedule(10, "cosine"))
    ds = SyntheticMRIDataset(img_size=(img, img), length=8)
    base = {"arg_num": "evalbm", "img_size": (img, img),
            "sample_distance": 8, "Batch_Size": 2}
    r0 = eval_testing(batch_iterator(ds, 2, shuffle=False), em, sched,
                      defaultdict_from_json(base), root_dir=str(tmp_path),
                      n_images=2, save_videos=False)
    r1 = eval_testing(batch_iterator(ds, 2, shuffle=False), em, sched,
                      defaultdict_from_json({**base,
                                             "vlb_batch_mean": True}),
                      root_dir=str(tmp_path), n_images=2, save_videos=False)
    for k in ("vb_at_200", "x_0_mse_at_200", "mse_at_200"):
        assert np.isfinite(r1[k]), k
    # batch-mean reduction over a 2-sample batch differs from element [0]
    assert r0["mse_at_200"] != r1["mse_at_200"]
