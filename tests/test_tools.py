"""Smoke tests for the tooling: labels, submission, analysis, dataset."""

import gzip
import json
import os

import numpy as np

from mass_tpu.config import CameraConfig, MapGeometry
from mass_tpu.env.rearrange import GridWorldTaskSampler
from mass_tpu.tools import analyze, submission
from mass_tpu.tools.search_labels import dump_labels
from mass_tpu.tools.detector_dataset import generate, format_dataset

CAM = CameraConfig(height=32, width=32)


def test_search_labels(tmp_path):
    sampler = GridWorldTaskSampler([0, 1], camera=CAM)
    geo = MapGeometry(64, 64, 16, grid_resolution=0.2)
    n = dump_labels(sampler, geo, str(tmp_path), 0, 2)
    assert n >= 1
    files = os.listdir(tmp_path)
    assert any(f.startswith("walkthrough-labels") for f in files)
    arr = np.load(tmp_path / sorted(files)[-1])
    assert arr.ndim == 2 and arr.shape[1] == 3


def _fake_results(tmp_path, name, records):
    d = tmp_path / name / "results"
    d.mkdir(parents=True)
    for i, rec in enumerate(records):
        with open(d / f"{i}.json", "w") as f:
            json.dump(rec, f)
    return str(tmp_path / name)


def test_submission_and_analysis(tmp_path):
    records = [
        {"unshuffle/prop_fixed_strict": 1.0, "unshuffle/success": 1.0,
         "unshuffle/num_initially_misplaced": 2,
         "unshuffle/num_newly_misplaced": 0,
         "unshuffle/objects_moved": ["Mug"],
         "unshuffle/objects_moved_accuracy": [1],
         "unshuffle/objects_to_move": ["Mug"],
         "unshuffle/objects_to_move_accuracy": [1],
         "unshuffle/ep_length": 80, "task_id": 0},
        {"unshuffle/prop_fixed_strict": 0.0, "unshuffle/success": 0.0,
         "unshuffle/num_initially_misplaced": 1,
         "unshuffle/num_newly_misplaced": 1,
         "unshuffle/objects_moved": ["Pen"],
         "unshuffle/objects_moved_accuracy": [0],
         "unshuffle/objects_to_move": ["Mug"],
         "unshuffle/objects_to_move_accuracy": [0],
         "unshuffle/ep_length": 250, "task_id": 1},
    ]
    logdir = _fake_results(tmp_path, "run-a", records)

    out = tmp_path / "submission.json.gz"
    submission.main(["--logdirs", logdir, "--output", str(out)])
    with gzip.open(out, "rt") as f:
        packed = json.load(f)
    assert len(packed) == 2

    table = analyze.metrics_table([logdir])
    mean, ci = table[logdir]["unshuffle/prop_fixed_strict"]
    assert abs(mean - 0.5) < 1e-6 and ci > 0

    pr = analyze.precision_recall([logdir])
    assert pr["Mug"]["tp"] == 1 and pr["Mug"]["fn"] == 1
    assert pr["Pen"]["fp"] == 1

    modes = analyze.failure_modes([logdir])
    assert modes["TaskSolved"] == 1
    assert modes["IncorrectObjectRearranged"] == 1


def test_ablation_sweep(tmp_path):
    """ablation groups logdirs by a swept params-*.json value and
    aggregates metric curves (reference: visualize_budget_ablation.py:
    88-90) — it must NOT be a plain alias of the metrics table."""
    def rec(fixed):
        return {"unshuffle/prop_fixed_strict": fixed,
                "unshuffle/success": float(fixed == 1.0),
                "unshuffle/num_initially_misplaced": 1,
                "unshuffle/num_newly_misplaced": 0}

    # two logdirs at budget 2, one at budget 6
    dirs = []
    for name, budget, recs in (
            ("b2-a", 2, [rec(0.0), rec(0.5)]),
            ("b2-b", 2, [rec(0.5)]),
            ("b6", 6, [rec(1.0), rec(1.0)])):
        d = _fake_results(tmp_path, name, recs)
        with open(os.path.join(d, "params-0-1.json"), "w") as f:
            json.dump({"exploration_budget_one": budget}, f)
        dirs.append(d)

    tables = analyze.ablation_table(dirs, "exploration_budget_one")
    table = tables[None]                    # ungrouped: single series
    assert list(table) == [2, 6]            # sorted by swept value
    assert table[2]["_n"] == 3              # groups pool across dirs
    m2, _ = table[2]["unshuffle/prop_fixed_strict"]
    m6, _ = table[6]["unshuffle/prop_fixed_strict"]
    assert abs(m2 - 1.0 / 3) < 1e-6 and m6 == 1.0

    out = tmp_path / "curves.png"
    analyze._plot_curves(tables, "exploration_budget_one", str(out))
    assert out.exists() and out.stat().st_size > 0

    # --group-by splits the dirs into one curve per value of a second
    # params key (reference's per-method budget figure)
    for d, ckpt in zip(dirs, ("p.pth", "p.pth", None)):
        with open(os.path.join(d, "params-0-1.json")) as f:
            params = json.load(f)
        params["policy_checkpoint"] = ckpt
        with open(os.path.join(d, "params-0-1.json"), "w") as f:
            json.dump(params, f)
    grouped = analyze.ablation_table(dirs, "exploration_budget_one",
                                     group_by="policy_checkpoint")
    assert set(grouped) == {"p.pth", "off"}
    assert list(grouped["p.pth"]) == [2] and list(grouped["off"]) == [6]
    assert grouped["p.pth"][2]["_n"] == 3
    out2 = tmp_path / "curves2.png"
    analyze._plot_curves(grouped, "exploration_budget_one", str(out2))
    assert out2.exists() and out2.stat().st_size > 0

    # the failure-mode and precision/recall plots render from the same
    # logdirs (reference: visualize_remainder.py,
    # visualize_precision_recall.py)
    fail_png = tmp_path / "failures.png"
    analyze._plot_failure_modes(
        {d: analyze.failure_modes([d]) for d in dirs}, str(fail_png))
    assert fail_png.exists() and fail_png.stat().st_size > 0
    pr_png = tmp_path / "pr.png"
    stats = {"Mug": dict(precision=0.5, recall=1.0, tp=1, fp=1, fn=0)}
    analyze._plot_precision_recall(stats, str(pr_png))
    assert pr_png.exists() and pr_png.stat().st_size > 0


def test_found_objects_curve(tmp_path):
    d = tmp_path / "results"
    d.mkdir()
    dist = np.asarray([[3.0, 2.0, 0.5, 0.4], [5.0, 4.0, 3.0, 0.9]])
    np.save(d / "objects-found-walkthrough-0.npy", dist)
    curves = analyze.found_objects_curves(str(tmp_path))
    np.testing.assert_allclose(curves["walkthrough"],
                               [0, 0, 0.5, 1.0])
    # multi-arm overlay: second logdir + CI bands through the CLI
    d2 = tmp_path / "arm-b" / "results"
    d2.mkdir(parents=True)
    np.save(d2 / "objects-found-walkthrough-0.npy", dist)
    np.save(d2 / "objects-found-walkthrough-1.npy", dist * 0.25)
    mean, sem, n = analyze.found_objects_stats(
        str(tmp_path / "arm-b"))["walkthrough"]
    assert n == 2 and sem.shape == mean.shape
    np.testing.assert_allclose(mean, [0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(sem[0], 0.25)
    out = tmp_path / "found.png"
    analyze.main(["found", str(tmp_path), str(tmp_path / "arm-b"),
                  "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0


def test_found_objects_radius_sweep(tmp_path):
    d = tmp_path / "results"
    d.mkdir()
    # object 0 min dist 0.4, object 1 min dist 0.9
    dist = np.asarray([[3.0, 2.0, 0.5, 0.4], [5.0, 4.0, 3.0, 0.9]])
    np.save(d / "objects-found-unshuffle-0.npy", dist)
    np.save(d / "objects-found-unshuffle-1.npy", dist * 4)  # 1.6, 3.6
    sweep = analyze.final_found_rate_by_radius(
        str(tmp_path), [0.5, 1.0, 2.0])["unshuffle"]
    rates = {r: mean for r, mean, _, n in sweep}
    assert all(n == 2 for *_, n in sweep)
    assert rates[0.5] == 0.25   # only task-0 object-0
    assert rates[1.0] == 0.5    # task 0 both, task 1 none
    assert rates[2.0] == 0.75   # + task-1 object-0 at 1.6
    out = tmp_path / "sweep.png"
    analyze.main(["found", str(tmp_path), "--radii", "0.5,1,2",
                  "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0


def test_found_objects_per_class(tmp_path):
    d = tmp_path / "results"
    d.mkdir()
    dist = np.asarray([[3.0, 2.0, 0.5, 0.4], [5.0, 4.0, 3.0, 0.9]])
    np.save(d / "objects-found-unshuffle-0.npy", dist)
    with open(d / "objects-found-unshuffle-0-types.json", "w") as f:
        json.dump(["Mug", "Spoon"], f)
    # a second task: one Mug never found, shorter episode (padding)
    np.save(d / "objects-found-unshuffle-1.npy",
            np.asarray([[9.0, 9.0, 9.0]]))
    with open(d / "objects-found-unshuffle-1-types.json", "w") as f:
        json.dump(["Mug"], f)
    # a legacy task without the sidecar is skipped, not fatal
    np.save(d / "objects-found-unshuffle-2.npy", dist)
    stats = analyze.found_objects_stats_by_class(str(tmp_path))
    per_class = stats["unshuffle"]
    mug_mean, _, mug_n = per_class["Mug"]
    spoon_mean, _, spoon_n = per_class["Spoon"]
    assert mug_n == 2 and spoon_n == 1
    np.testing.assert_allclose(spoon_mean, [0, 0, 0, 1.0])
    np.testing.assert_allclose(mug_mean, [0, 0, 0.5, 0.5])
    out = tmp_path / "classes.png"
    analyze.main(["found", str(tmp_path), "--per-class",
                  "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0


def test_detector_dataset(tmp_path):
    n = generate(str(tmp_path), total_tasks=1, poses_per_scene=3,
                 camera_size=32)
    assert n == 6  # 2 phases x 3 poses
    tr, va = format_dataset(str(tmp_path), validation_fraction=0.2)
    assert tr + va == 6 and va >= 1
    with open(tmp_path / "training.json") as f:
        recs = json.load(f)
    assert all("file_name" in r and "annotations" in r for r in recs)
    assert any(r["annotations"] for r in recs)


def test_object_analytics_aggregation(tmp_path):
    import csv
    d = tmp_path / "results"
    d.mkdir()
    rows = [
        dict(type="Mug", initial_correct=False, final_correct=True,
             initial_distance=1.0, final_distance=0.05),
        dict(type="Mug", initial_correct=False, final_correct=False,
             initial_distance=2.0, final_distance=1.9),
        dict(type="Pen", initial_correct=True, final_correct=True,
             initial_distance=0.0, final_distance=0.0),
    ]
    with open(d / "analytics-0.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[""] + list(rows[0]))
        w.writeheader()
        for i, r in enumerate(rows):
            w.writerow({"": i, **r})
    table = analyze.object_analytics([str(tmp_path)])
    assert table.loc["Mug", "count"] == 2
    assert abs(table.loc["Mug", "fixed_rate"] - 0.5) < 1e-9
    assert "Pen" not in table.index  # initially correct: excluded


def test_analytics_fix_rate_plot(tmp_path):
    """The analytics --out plot bins fix rate over the reference's
    feature axes (reference: visualize_analytics.py defaults)."""
    import csv
    d = tmp_path / "results"
    d.mkdir()
    rng = __import__("numpy").random.RandomState(0)
    rows = [dict(type="Mug", initial_correct=False,
                 final_correct=bool(i % 2),
                 initial_distance=float(rng.uniform(0.5, 3.0)),
                 final_distance=0.1, size=float(rng.uniform(0.01, 0.2)),
                 initial_min_distance_type="")
            for i in range(12)]
    with open(d / "analytics-0.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[""] + list(rows[0]))
        w.writeheader()
        for i, r in enumerate(rows):
            w.writerow({"": i, **r})
    out = tmp_path / "analytics.png"
    analyze._plot_analytics([str(tmp_path)], str(out), bins=4)
    assert out.exists() and out.stat().st_size > 0


def test_paired_compare(tmp_path):
    """compare pairs two arms on common task ids and runs an exact
    McNemar test on the discordant outcomes (pooled bars alone are
    noise-inflated at small n — see docs/experiments.md)."""
    def rec(fixed):
        return {"unshuffle/prop_fixed_strict": fixed,
                "unshuffle/success": float(fixed == 1.0),
                "unshuffle/num_initially_misplaced": 1,
                "unshuffle/num_newly_misplaced": 0}

    # A wins tasks 0-4, B wins task 5, ties 6-7; task 99 only in A
    a = _fake_results(tmp_path, "arm-a",
                      [rec(v) for v in (1, 1, 1, 1, 1, 0, 1, 0)])
    b = _fake_results(tmp_path, "arm-b",
                      [rec(v) for v in (0, 0, 0, 0, 0, 1, 1, 0)])
    with open(os.path.join(a, "results", "99.json"), "w") as f:
        json.dump(rec(1.0), f)

    # the found-objects recorder drops non-task JSONs (a bare LIST of
    # class names) into results/ — load_results must skip them
    # (regression: this broke every analyze subcommand on logdirs run
    # with --record-found-objects)
    with open(os.path.join(a, "results",
                           "objects-found-unshuffle-0-types.json"),
              "w") as f:
        json.dump(["Mug", "Laptop"], f)

    out = analyze.paired_compare(a, b)
    assert out["n"] == 8                    # 99 unmatched -> excluded
    assert out["wins"] == 5 and out["losses"] == 1 and out["ties"] == 2
    # exact binomial: 2 * (1 + 6) / 2**6
    assert abs(out["mcnemar_p"] - 2 * 7 / 64) < 1e-9
    assert abs(out["mean_a"][0] - 6 / 8) < 1e-9
    assert abs(out["mean_b"][0] - 2 / 8) < 1e-9


def test_paired_found_compare(tmp_path):
    """compare --metric found:unshuffle pairs the FINAL per-task
    found-objects rate (continuous endpoint -> paired t-test) on
    common task ids at the given radius."""
    for arm, scale in (("arm-a", 1.0), ("arm-b", 4.0)):
        d = tmp_path / arm / "results"
        d.mkdir(parents=True)
        # two objects; arm-b's scaled distances keep object 2 unfound
        dist = np.asarray([[3.0, 0.5], [5.0, 0.8]]) * scale
        np.save(d / "objects-found-unshuffle-0.npy", dist)
        np.save(d / "objects-found-unshuffle-1.npy", dist * 0.1)
    # unmatched extra task in arm-a only -> excluded from the pairing
    np.save(tmp_path / "arm-a" / "results"
            / "objects-found-unshuffle-9.npy",
            np.asarray([[0.1, 0.1]]))

    out = analyze.paired_found_compare(
        str(tmp_path / "arm-a"), str(tmp_path / "arm-b"), radius=1.0)
    assert out["n"] == 2
    # arm-a: task0 both found (1.0), task1 both found (1.0)
    # arm-b: task0 none found (0.0), task1 both found (1.0)
    assert abs(out["mean_a"][0] - 1.0) < 1e-9
    assert abs(out["mean_b"][0] - 0.5) < 1e-9
    assert abs(out["delta"] - 0.5) < 1e-9
    assert 0.0 < out["p"] <= 1.0

    # identical arms -> exact tie, p = 1
    tie = analyze.paired_found_compare(
        str(tmp_path / "arm-a"), str(tmp_path / "arm-a"), radius=1.0)
    assert tie["delta"] == 0.0 and tie["p"] == 1.0

    analyze.main(["compare", str(tmp_path / "arm-a"),
                  str(tmp_path / "arm-b"),
                  "--metric", "found:unshuffle", "--radius", "1.0"])


def test_map_snapshots(tmp_path):
    """--snapshot-maps dumps recoverable voxel-map state
    (SURVEY.md §5.4; the reference's commented-out np.save practice,
    agent.py:417-418)."""
    import numpy as np

    from mass_tpu.agent import metrics as M
    from mass_tpu.config import MapGeometry
    from mass_tpu.core.voxelmap import VoxelMap

    geo = MapGeometry(map_height=16, map_width=16, map_depth=4,
                      grid_resolution=0.25, feature_size=8)
    vm = VoxelMap.create(geo, (1.0, 1.0, 0.5))
    grid = np.zeros((16, 16, 4, 8), np.float32)
    grid[3, 5, 1, 2] = 0.75
    vm = vm.with_grid(grid)

    path = M.write_map_snapshots(str(tmp_path), 7, {"semantic0": vm})
    with np.load(path) as z:
        assert z["semantic0"].shape == (16, 16, 4, 8)
        assert z["semantic0"].dtype == np.float16
        np.testing.assert_allclose(z["semantic0"][3, 5, 1, 2], 0.75)
        assert z["semantic0_bins_x"].shape == vm.bins_x.shape
    assert path.endswith("maps-7.npz")


def test_timing_aggregation(tmp_path):
    """`analyze timing` pools the per-task StageTimer blocks."""
    import json

    from mass_tpu.tools import analyze

    rdir = tmp_path / "results"
    rdir.mkdir()
    for tid, ms in ((0, 2.0), (1, 4.0)):
        (rdir / f"{tid}.json").write_text(json.dumps({
            "unshuffle/prop_fixed_strict": 1.0,
            "timing": {"mapping": {"total_s": ms / 1e3 * 10,
                                   "count": 10,
                                   "mean_ms": ms}}}))
    table = analyze.timing_table([str(tmp_path)])
    stages = table[tmp_path.name]
    assert stages["_tasks"] == 2
    assert stages["mapping"]["count"] == 20
    np.testing.assert_allclose(stages["mapping"]["mean_ms"], 3.0)
    np.testing.assert_allclose(stages["mapping"]["s_per_task"], 0.03)
    analyze.main(["timing", str(tmp_path)])   # smoke the CLI printer
