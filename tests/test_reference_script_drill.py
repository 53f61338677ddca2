"""Script-vs-CLI eval drill (VERDICT r4 Next #5).

Executes the reference's ACTUAL checkpoint-free eval entry script
``/root/reference/code/test_l2l.py`` (not just its modules) as a subprocess
on synthetic data laid out in its hardcoded relative paths
(``../data/l2l_vico_predictions.pkl``, ``../data/RLD_data.csv``,
``../data/vico_dataset/emoca/...`` - test_l2l.py:10-26), runs OUR
``cli.test_l2l`` on the same clips, and asserts the printed metric
batteries agree number for number. This is the closest in-image
approximation of the blocked real-checkpoint north star: the reference
*entry point* itself produces the numbers we compare against.

The reference script imports ``pickle5`` (a py3.8 backport absent here);
the drill provides a one-line stdlib-pickle shim on PYTHONPATH - the
reference code itself is untouched.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, has_reference

if not has_reference():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

REF_SCRIPT = os.path.join(REFERENCE_ROOT, "test_l2l.py")


def _parse_metric_lines(stdout: str):
    """'name: v [v2]' print lines -> {name: [floats]}."""
    out = {}
    for line in stdout.splitlines():
        if ":" not in line:
            continue
        name, _, rest = line.partition(":")
        vals = []
        for tok in rest.split():
            try:
                vals.append(float(tok))
            except ValueError:
                break
        if vals:
            out[name.strip()] = vals
    return out


def _make_clips(n_clips=3, t=40, seed=0):
    rng = np.random.default_rng(seed)
    clips = []
    for _ in range(n_clips):
        gt = rng.normal(0, 0.4, (t, 56)).astype(np.float32)    # [pose6, exp50]
        x = rng.normal(0, 0.4, (t, 56)).astype(np.float32)
        pred = (gt + rng.normal(0, 0.2, (t, 56))).astype(np.float32)
        clips.append((gt, x, pred))
    return clips


def _write_reference_layout(root, clips):
    """The exact dir/file layout test_l2l.py:10-26 hardcodes, relative to a
    ``run/`` cwd. Column semantics follow the script's own reads: gt frames
    load from the row[3] dir, speaker context from the row[2] dir
    (test_l2l.py:22-26,36,58)."""
    run = root / "run"
    data = root / "data"
    emoca = data / "vico_dataset" / "emoca"
    run.mkdir()
    emoca.mkdir(parents=True)

    rows = []
    preds = {}
    for i, (gt, x, pred) in enumerate(clips):
        fid, gt_dir, x_dir = f"clip{i}", f"gt{i}", f"x{i}"
        rows.append([i, fid, x_dir, gt_dir])
        # the script reads exp.npy/pose.npy/detail.npy from frame dirs
        # starting with '0' under <dir>/EMOCA_v2_lr_mse_20 (test_l2l.py:36-55)
        for name, arr in ((gt_dir, gt), (x_dir, x)):
            for f in range(arr.shape[0]):
                d = emoca / name / "EMOCA_v2_lr_mse_20" / f"{f:05d}"
                d.mkdir(parents=True)
                np.save(d / "pose.npy", arr[f, :6])
                np.save(d / "exp.npy", arr[f, 6:])
                np.save(d / "detail.npy", np.zeros(4, np.float32))
        # predictions pickle stores [exp50, pose6]; the script swaps them
        # back to [pose6, exp50] (test_l2l.py:82)
        preds[fid] = np.concatenate([pred[:, 6:], pred[:, :6]], axis=1)
    with open(data / "l2l_vico_predictions.pkl", "wb") as f:
        pickle.dump(preds, f)
    import pandas as pd

    pd.DataFrame(rows, columns=["idx", "file_id", "listener", "speaker"]
                 ).to_csv(data / "RLD_data.csv", index=False)

    shim = root / "shim" / "pickle5"
    shim.mkdir(parents=True)
    (shim / "__init__.py").write_text("from pickle import *  # noqa\n")
    return run, root / "shim"


@pytest.mark.slow
def test_reference_test_l2l_script_matches_cli(tmp_path):
    clips = _make_clips()
    run_dir, shim_dir = _write_reference_layout(tmp_path, clips)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REFERENCE_ROOT, str(shim_dir), env.get("PYTHONPATH", "")])
    ref = subprocess.run([sys.executable, REF_SCRIPT], cwd=str(run_dir),
                         env=env, capture_output=True, text=True, timeout=600)
    assert ref.returncode == 0, ref.stderr[-2000:]
    ref_metrics = _parse_metric_lines(ref.stdout)
    assert "fid_pose" in ref_metrics and "sts exp" in ref_metrics, ref.stdout

    # our CLI on the same clips (its pickle carries the arrays directly)
    ours_pkl = tmp_path / "ours.pkl"
    with open(ours_pkl, "wb") as f:
        pickle.dump({"y_true": [c[0] for c in clips],
                     "x": [c[1] for c in clips],
                     "y_pred": [c[2] for c in clips]}, f)
    ours = subprocess.run(
        [sys.executable, "-m", "dyadic_interaction_modeling_tpu.cli.test_l2l",
         "--predictions", str(ours_pkl)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, DIM_TPU_PLATFORM="cpu"),
        capture_output=True, text=True, timeout=600)
    assert ours.returncode == 0, ours.stderr[-2000:]
    our_metrics = _parse_metric_lines(ours.stdout)

    # every metric the reference script prints must match ours numerically
    compared = 0
    for name, ref_vals in ref_metrics.items():
        if name.startswith("erron"):
            continue
        assert name in our_metrics, f"CLI did not print {name!r}"
        np.testing.assert_allclose(
            our_metrics[name][: len(ref_vals)], ref_vals, rtol=1e-4,
            atol=1e-7, err_msg=f"metric {name!r} diverges from the "
            f"reference script")
        compared += 1
    assert compared >= 14  # the full battery, not a lucky subset
