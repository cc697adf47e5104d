"""Detection-driver behaviours: rank-3 sample normalisation, DDIM arg
parsing against defaultdict-str configs, and the full anomalous_validation
recipe (detection.py:17-153)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu.config import defaultdict_from_json
from anoddpm_tpu.models.unet import UNet
from anoddpm_tpu.ops.noise import make_noise_sampler
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
from anoddpm_tpu.training import EvalModel

IMG = 32


@pytest.fixture(scope="module")
def tiny_model():
    model = UNet(img_size=IMG, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, IMG, IMG, 1)),
                                 jnp.zeros((1,), jnp.int32))
    em = EvalModel(model, params)
    sched = make_schedule(get_beta_schedule(10, "cosine"))
    return em, sched


def test_evaluate_anomaly_batch_rank3(tiny_model):
    """(H, W, C) single samples (MVTec/DAGM shape) are normalised to a batch
    of one — the reference evaluates per-image (detection.py:208-221)."""
    from anoddpm_tpu.detect import evaluate_anomaly_batch
    em, sched = tiny_model
    img = np.random.default_rng(0).normal(size=(IMG, IMG, 1)).astype(np.float32)
    mask = (np.random.default_rng(1).random((IMG, IMG, 1)) > 0.9).astype(np.float32)
    out, recon = evaluate_anomaly_batch(em, sched, img, mask,
                                        jax.random.key(2),
                                        make_noise_sampler("gauss"),
                                        t_distance=5)
    assert recon.shape == (1, IMG, IMG, 1)
    assert len(out["auc"]) == 1 and np.isfinite(out["auc"][0])


def test_metric_calculation_ddim_without_eta(tiny_model, tmp_path):
    """sampler=ddim with no ddim_eta key must not crash: defaultdict .get()
    returns None for absent keys, and float(None) raised before the fix."""
    from anoddpm_tpu.detect import anomalous_metric_calculation
    em, sched = tiny_model
    args = defaultdict_from_json({
        "arg_num": "ddimeta", "img_size": (IMG, IMG), "noise_fn": "gauss",
        "dataset": "synthetic", "sampler": "ddim", "ddim_steps": 3})
    assert args.get("ddim_eta") is None  # the hazard under test
    out = anomalous_metric_calculation(args, root_dir=str(tmp_path),
                                       em=em, sched=sched, t_distance=5,
                                       max_volumes=1)
    assert np.isfinite(out["auc"])


def test_metric_calculation_recon_repeats(tiny_model, tmp_path):
    """recon_repeats=k averages k independent reconstructions before the
    sq-err map (the reference's own detection-sweep semantics,
    detection.py:114-128) and must go through the same metric path."""
    from anoddpm_tpu.detect import anomalous_metric_calculation
    em, sched = tiny_model
    base = {"arg_num": "reps", "img_size": (IMG, IMG), "noise_fn": "gauss",
            "dataset": "synthetic", "sampler": "ddim", "ddim_steps": 3,
            "ddim_eta": 1.0}
    out1 = anomalous_metric_calculation(
        defaultdict_from_json(base), root_dir=str(tmp_path), em=em,
        sched=sched, t_distance=5, max_volumes=1)
    out2 = anomalous_metric_calculation(
        defaultdict_from_json({**base, "recon_repeats": 2}),
        root_dir=str(tmp_path), em=em, sched=sched, t_distance=5,
        max_volumes=1)
    assert np.isfinite(out2["auc"])
    # averaging changes the error map, so the metrics must not be
    # byte-identical to the single-recon run (same PRNG seed path)
    assert out1["auc"] != out2["auc"]


def test_detection_A_one_compile_per_lambda(tiny_model, tmp_path,
                                            monkeypatch):
    """The frequency axis must NOT multiply compiles: detection_A sweeps
    7 frequencies x N lambdas but frequency is a traced runtime scalar, so
    exactly one jitted program per lambda is built (VERDICT round-2 item 2;
    sweep protocol per GaussianDiffusion.py:480-529)."""
    import anoddpm_tpu.detect as D
    em, sched = tiny_model
    D.clear_program_cache()
    calls = []
    real = D.jit_with_params
    monkeypatch.setattr(D, "jit_with_params",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    args = defaultdict_from_json({
        "arg_num": "cc", "img_size": (IMG, IMG), "T": 200})
    x_0 = jnp.zeros((1, IMG, IMG, 1))
    mask = np.zeros((1, IMG, IMG, 1), np.float32)
    D.detection_A(args, em, sched, x_0, mask, "v0",
                  root_dir=str(tmp_path), total_avg=1)
    n_lambdas = len(range(50, int(200 * 0.6), 50))  # 2
    assert len(calls) == n_lambdas, (
        f"expected one program per lambda ({n_lambdas}), got {len(calls)}")
    out = os.path.join(str(tmp_path), "diffusion-videos", "ARGS=cc",
                       "Anomalous", "v0", "A")
    assert len(os.listdir(out)) == 7 * n_lambdas  # all grids still written
    # cross-call axis (VERDICT r3 #3): a second call — as anomalous_
    # validation issues once per slice — must compile NOTHING new
    D.detection_A(args, em, sched, x_0, mask, "v1",
                  root_dir=str(tmp_path), total_avg=1)
    assert len(calls) == n_lambdas, (
        f"repeated detection_A call recompiled: {len(calls)} programs")


def test_detection_A_fixedT_single_compile_and_freq_variation(
        tiny_model, tmp_path, monkeypatch):
    """detection_A_fixedT builds ONE reverse-chain program for all
    frequency rows, and the rows actually differ (the traced frequency is
    live, not constant-folded)."""
    import anoddpm_tpu.detect as D
    em, sched = tiny_model
    D.clear_program_cache()
    calls = []
    real = D.jit_with_params
    monkeypatch.setattr(D, "jit_with_params",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    args = defaultdict_from_json({"arg_num": "cf", "img_size": (IMG, IMG)})
    x_0 = jnp.zeros((1, IMG, IMG, 1))
    mask = np.zeros((1, IMG, IMG, 1), np.float32)
    rows = D.detection_A_fixedT(args, em, sched, x_0, mask,
                                root_dir=str(tmp_path), end_freq=3,
                                t_distance=4)
    assert len(calls) == 1
    assert rows.shape[0] == 3 * 6  # 3 freq rows x 6 panels
    # x_noised panels (index 1 within each row) differ across frequencies
    row0, row1 = rows[1], rows[7]
    assert np.abs(row0 - row1).max() > 1e-3


def test_graph_data_per_volume_dense(tiny_model, tmp_path):
    """graph_data writes per-volume metrics/ARGS={n}/{vol}.csv + plot at
    the reference artifact shape (detection.py:417-428), here with a DENSE
    lambda grid (every lambda in [0, T)) served by ONE compiled
    lambda-batched program, plus the pooled CSV/plot."""
    from anoddpm_tpu.detect import graph_data
    em, sched = tiny_model  # T = 10
    args = defaultdict_from_json({
        "arg_num": "gd", "img_size": (IMG, IMG), "noise_fn": "gauss",
        "dataset": "synthetic"})
    rows = graph_data(args=(args, em, sched), root_dir=str(tmp_path),
                      max_volumes=2, dense=True, lambda_batch=4)
    assert len(rows) == 10  # lambda in [0, 10)
    vol_dir = os.path.join(str(tmp_path), "metrics", "ARGS=gd")
    csvs = [f for f in os.listdir(vol_dir) if f.endswith(".csv")]
    pngs = [f for f in os.listdir(vol_dir) if f.endswith(".png")]
    assert len(csvs) == 2 and len(pngs) == 2  # one per volume
    lines = open(os.path.join(vol_dir, csvs[0])).read().strip().splitlines()
    assert lines[0] == "timestep,Dice,SSIM,IOU,Precision,Recall,FPR"
    assert len(lines) == 1 + 10  # header + dense grid
    assert lines[1].startswith("0000,")
    # lambda=0 row: recon == x_0 -> zero sq-err -> empty prediction
    # (FPR is NOT 0 here: the reference's swapped-FPR quirk counts
    # missed positives, PARITY.md)
    first = dict(zip(lines[0].split(","), lines[1].split(",")))
    assert float(first["SSIM"]) == 1.0 and float(first["Precision"]) == 0.0
    assert float(first["Dice"]) < 1e-4
    # pooled surface still written
    assert os.path.exists(os.path.join(str(tmp_path), "metrics",
                                       "argsgd-lambda.csv"))


def test_anomalous_validation_full_recipe(tiny_model, tmp_path, monkeypatch):
    """All-volume default, per-slice videos + heatmaps + detection_B, dice
    list returned (detection.py:17-153 semantics)."""
    from anoddpm_tpu.detect import anomalous_validation
    em, sched = tiny_model
    args = defaultdict_from_json({
        "arg_num": "val", "img_size": (IMG, IMG), "noise_fn": "simplex",
        "dataset": "synthetic", "sample_distance": 8, "T": 10})
    dice = anomalous_validation((args, em, sched), root_dir=str(tmp_path),
                                max_volumes=2, max_slices=2,
                                detection_avg=1)
    assert len(dice) == 4  # 2 volumes x 2 slices
    base = os.path.join(str(tmp_path), "diffusion-videos", "ARGS=val",
                        "Anomalous")
    vols = os.listdir(base)
    assert len(vols) == 2
    slice_dirs = os.listdir(os.path.join(base, vols[0]))
    # per-slice artifact dirs + per-slice detection_B dirs
    assert len(slice_dirs) >= 2


def test_roc_cli_lesion_severity_override(monkeypatch):
    """`roc ... LESION=<kind>[:<severity>]` forwards the parsed override to
    roc_data (detection.py ROC driver; severity per
    results/diffuse_calibration.json)."""
    from anoddpm_tpu import detect as D

    calls = {}

    def fake_roc_data(tokens, use_checkpoint=False, ce_token=None,
                      args_override=None):
        calls.update(tokens=tokens, ce_token=ce_token,
                     args_override=args_override)

    monkeypatch.setattr(D, "roc_data", fake_roc_data)
    D.main(["tokA", "roc", "tokB", "CE=ce_cfg", "LESION=diffuse:1.5"])
    assert calls["tokens"] == ["tokA", "tokB"]
    assert calls["ce_token"] == "ce_cfg"
    assert calls["args_override"] == {"lesion_kind": "diffuse",
                                      "lesion_severity": 1.5}
    # bare kind (no severity) keeps the dataset default
    D.main(["tokA", "roc", "LESION=diffuse"])
    assert calls["args_override"] == {"lesion_kind": "diffuse"}


def test_detection_B_one_compile_per_chain_across_calls(tiny_model, tmp_path,
                                                        monkeypatch):
    """detection_B compiles one program per unique chain length across
    REPEATED calls (VERDICT r3 #3): anomalous_validation invokes it once per
    slice, and before the cross-call cache every slice re-traced every
    lambda's reverse scan."""
    import anoddpm_tpu.detect as D
    em, sched = tiny_model
    D.clear_program_cache()
    calls = []
    real = D.jit_with_params
    monkeypatch.setattr(D, "jit_with_params",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    args = defaultdict_from_json({
        "arg_num": "bcc", "img_size": (IMG, IMG), "T": 200})
    x_0 = jnp.zeros((1, IMG, IMG, 1))
    mask = np.zeros((1, IMG, IMG, 1), np.float32)
    n_lambdas = len(range(50, int(200 * 0.6), 50))  # 2
    for call in range(3):  # three "slices"
        D.detection_B(args, em, sched, x_0, mask, f"s{call}",
                      denoise_fn="octave", root_dir=str(tmp_path),
                      total_avg=1)
        assert len(calls) == n_lambdas, (
            f"call {call}: {len(calls)} compiles, want {n_lambdas}")
    # a different method key gets its own programs (gauss denoise grid is
    # 0.8T, so 3 lambdas at T=200)
    D.detection_B(args, em, sched, x_0, mask, "g0", denoise_fn="gauss",
                  root_dir=str(tmp_path), total_avg=1)
    assert len(calls) == n_lambdas + len(range(50, int(200 * 0.8), 50))


def test_anomalous_validation_cross_slice_compile_cache(tiny_model, tmp_path,
                                                        monkeypatch):
    """A full anomalous_validation drive re-run must add ZERO compiles the
    second time (cross-call cache; VERDICT r3 #3)."""
    import anoddpm_tpu.detect as D
    em, sched = tiny_model
    D.clear_program_cache()
    calls = []
    real = D.jit_with_params
    monkeypatch.setattr(D, "jit_with_params",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    args = defaultdict_from_json({
        "arg_num": "vcc", "img_size": (IMG, IMG), "noise_fn": "simplex",
        "dataset": "synthetic", "sample_distance": 8, "T": 10})
    D.anomalous_validation((args, em, sched), root_dir=str(tmp_path),
                           max_volumes=1, max_slices=2, detection_avg=1)
    first = len(calls)
    assert first > 0
    D.anomalous_validation((args, em, sched), root_dir=str(tmp_path),
                           max_volumes=1, max_slices=2, detection_avg=1)
    assert len(calls) == first, (
        f"re-run recompiled: {len(calls)} vs {first}")


def test_auto_lambda_batch_and_empty_grid(tiny_model, tmp_path):
    """lambda_batch default auto-sizes HBM-safely (32 at 256^2 — the LB=128
    default OOMed the v5e worker, VERDICT r3 #4 / ADVICE r3) and an empty
    50-step grid degrades gracefully instead of raising on max([])."""
    from anoddpm_tpu.detect import _auto_lambda_batch, graph_data
    assert _auto_lambda_batch(256) == 32
    assert _auto_lambda_batch(128) == 128
    assert _auto_lambda_batch(512) == 8
    assert _auto_lambda_batch(1024) == 8
    em, sched = tiny_model  # T = 10: range(50, 10, 50) is empty
    args = defaultdict_from_json({
        "arg_num": "eg", "img_size": (IMG, IMG), "noise_fn": "gauss",
        "dataset": "synthetic"})
    rows = graph_data(args=(args, em, sched), root_dir=str(tmp_path),
                      max_volumes=1, dense=False)
    assert rows == []


def test_metric_calculation_volume_batch_equivalence(tiny_model, tmp_path,
                                                     monkeypatch):
    """volume_batch groups N volumes' slices into one reverse-chain dispatch
    (MXU amortisation — the reference walks volumes one by one,
    detection.py:208-221).  Under a deterministic reconstruction the
    per-slice metrics must be EXACTLY those of the ungrouped walk: grouping
    is a dispatch-shape change, not a semantic one."""
    from anoddpm_tpu import detect as D
    em, sched = tiny_model
    monkeypatch.setattr(
        D, "jit_with_params",
        lambda em_, build: (lambda x, k: (x * 0.9, None)))
    base = {"arg_num": "vb", "img_size": (IMG, IMG), "noise_fn": "gauss",
            "dataset": "synthetic"}
    out1 = D.anomalous_metric_calculation(
        defaultdict_from_json(base), root_dir=str(tmp_path), em=em,
        sched=sched, t_distance=5, max_volumes=4)
    out3 = D.anomalous_metric_calculation(
        defaultdict_from_json(base), root_dir=str(tmp_path), em=em,
        sched=sched, t_distance=5, max_volumes=4, volume_batch=3)
    # vb=3 over 4 volumes exercises the uneven remainder group too
    for k in ("auc", "dice", "ssim", "iou"):
        assert out1[k] == pytest.approx(out3[k], abs=1e-12), k


def test_sched_fp_no_endpoint_collision(tiny_model, monkeypatch):
    """Two schedules agreeing at the ENDPOINTS but differing inside must not
    share a compiled reverse chain (round-4 VERDICT weak #6: the old
    fingerprint keyed on (T, betas[0], betas[-1]) only)."""
    import anoddpm_tpu.detect as D
    em, _ = tiny_model
    D.clear_program_cache()
    calls = []
    real = D.jit_with_params
    monkeypatch.setattr(D, "jit_with_params",
                        lambda *a, **k: calls.append(1) or real(*a, **k))

    lin = get_beta_schedule(10, "linear")
    bent = lin.copy()
    bent[5] *= 1.5                      # same endpoints, different interior
    s1, s2 = make_schedule(lin), make_schedule(bent)
    assert D._sched_fp(s1) != D._sched_fp(s2)

    sampler = make_noise_sampler("gauss")
    x = np.zeros((1, IMG, IMG, 1), np.float32)
    mask = np.zeros((1, IMG, IMG, 1), np.float32)
    D.evaluate_anomaly_batch(em, s1, x, mask, jax.random.key(0), sampler,
                             t_distance=5)
    assert len(calls) == 1
    D.evaluate_anomaly_batch(em, s2, x, mask, jax.random.key(0), sampler,
                             t_distance=5)
    assert len(calls) == 2, "interior-differing schedule reused s1's program"


def test_eval_batch_fresh_sampler_no_recompile(tiny_model, monkeypatch):
    """evaluate_anomaly_batch keys its program on sampler PARAMETERS: two
    make_noise_sampler calls with identical arguments return distinct
    closures that must share one compiled program (round-4 VERDICT weak #7),
    while a sampler with different parameters gets its own."""
    import anoddpm_tpu.detect as D
    em, sched = tiny_model
    D.clear_program_cache()
    calls = []
    real = D.jit_with_params
    monkeypatch.setattr(D, "jit_with_params",
                        lambda *a, **k: calls.append(1) or real(*a, **k))

    x = np.zeros((1, IMG, IMG, 1), np.float32)
    mask = np.zeros((1, IMG, IMG, 1), np.float32)
    for _ in range(2):  # fresh closure per call, same parameters
        sampler = make_noise_sampler("simplex", octaves=2, frequency=16)
        D.evaluate_anomaly_batch(em, sched, x, mask, jax.random.key(0),
                                 sampler, t_distance=5)
    assert len(calls) == 1, "identical-parameter sampler recompiled"

    other = make_noise_sampler("simplex", octaves=3, frequency=16)
    D.evaluate_anomaly_batch(em, sched, x, mask, jax.random.key(0), other,
                             t_distance=5)
    assert len(calls) == 2, "different-parameter sampler shared a program"

    def custom(key, shape, t):             # no fingerprint: object identity
        return jnp.zeros(shape)

    D.evaluate_anomaly_batch(em, sched, x, mask, jax.random.key(0), custom,
                             t_distance=5)
    assert len(calls) == 3
