"""CLI + experiment registry tests (tiny configs, synthetic data, CPU)."""

import json

import pytest

from carla_imitation_learning_tpu.cli import main as cli_main

TINY = [
    "NUM_EPOCHS=1", "BATCH_SIZE=4", "synthetic_frames=60",
    "image_height=64", "image_width=64", "compute_dtype=float32",
    "trainer.num_sanity_val_steps=0",
    "sim.n_envs=4", "sim.n_agents=3", "render.height=32", "render.width=32",
    "render.max_triangles=256", "sim.town.blocks=2", "sim.town.n_buildings=6",
    "sim.n_lights=4",
]


def _overrides(tmp_path, extra=()):
    out = []
    for o in TINY + [f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs"] + list(extra):
        out += ["-o", o]
    return out


def test_cli_list(capsys):
    assert cli_main(["list"]) == 0
    out = capsys.readouterr().out
    for name in ("bc", "bc_aux", "bc_raw_segment", "vae_pooled", "vae_leave_one_out",
                 "test_eval", "split_folders", "collect_data", "closed_loop_eval",
                 "dagger", "hpo", "bc_cil", "export_policy", "rl_finetune"):
        assert name in out


def test_cli_unknown_experiment():
    assert cli_main(["run", "nope"]) == 2


def test_cli_bc_end_to_end(tmp_path, capsys):
    rc = cli_main(["run", "bc", "--json"] + _overrides(tmp_path))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert "camera" in result and "semantic" in result
    assert result["camera"]["history"][-1]["val_loss"] > 0
    assert result["camera"]["best_path"] is not None


def test_cli_bc_aux(tmp_path, capsys):
    rc = cli_main(["run", "bc_aux", "--json"] + _overrides(tmp_path))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["camera"]["history"][-1]["val_autopilot_action_loss"] > 0


def test_cli_bc_raw_segment(tmp_path, capsys):
    rc = cli_main(["run", "bc_raw_segment", "--json"] + _overrides(tmp_path))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["history"][-1]["train_loss"] > 0


def test_cli_vae_pooled(tmp_path, capsys):
    rc = cli_main(["run", "vae_pooled", "--json"] + _overrides(
        tmp_path, ["image_size=[1,32,32]", "logs=['Log1','Log2']", "synthetic_frames=24"]))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert "val_kl_loss" in result["history"][-1]


def test_cli_test_eval(tmp_path, capsys):
    rc = cli_main(["run", "test_eval", "--json"] + _overrides(tmp_path))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert set(result["accuracy"]) == {"train", "val", "test"}


def test_cli_hpo(tmp_path, capsys):
    rc = cli_main(["run", "hpo", "--json"] + _overrides(tmp_path))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["n_trials"] == 4
    assert "lr" in result["best_config"]


@pytest.mark.slow
def test_cli_dagger(tmp_path, capsys):
    rc = cli_main(["run", "dagger", "--json"] + _overrides(tmp_path))
    assert rc == 0


@pytest.mark.slow
def test_cli_dagger_cil_goal_directed(tmp_path, capsys):
    """dagger -o policy_family=cil -o n_goals=N is on-policy A→B
    aggregation: round 0 is the navigating expert, later rounds the
    navigating BranchedCILPolicy with expert labels, and the final policy
    is scored on the routes (arrival rate / infractions)."""
    rc = cli_main(["run", "dagger", "--json"] + _overrides(
        tmp_path, ["policy_family=cil", "n_goals=2", "rounds=2",
                   "n_envs=4", "n_steps=48", "epochs_per_round=1",
                   "frame_skip=2"]))  # non-default: model must follow cfg
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert len(result["rounds"]) == 2
    assert result["rounds"][-1]["dataset_frames"] > 0
    assert "arrival_rate" in result["routes"]
    assert "infractions_per_km" in result["routes"]


def test_cli_experiment_preset(tmp_path, capsys):
    """-o experiment=<preset> selects the block AND its knobs
    (configs/experiment/*.yaml — the reference's exp_example_* scheme)."""
    rc = cli_main(["run", "--json", "-o", "experiment=debug"]
                  + _overrides(tmp_path, ["trainer.max_epochs=1", "NUM_EPOCHS=1"]))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert "camera" in result  # debug preset runs bc on the camera view


def test_cli_no_experiment_given(tmp_path):
    assert cli_main(["run", "-o", f"data_dir={tmp_path}/d"]) == 2


def test_kwargs_from_cfg(tmp_path, capsys):
    """Top-level cfg keys override experiment kwarg defaults (n_envs etc.)."""
    rc = cli_main(["run", "closed_loop_eval", "--json"]
                  + _overrides(tmp_path, ["n_envs=4", "n_steps=6"]))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["policy"]["env_steps"] == 24  # 4 envs x 6 steps, from cfg


def test_cli_hpo_pbt(tmp_path, capsys):
    rc = cli_main(["run", "--json", "-o", "experiment=hpo_pbt",
                   "-o", "population=4", "-o", "generations=2"]
                  + _overrides(tmp_path))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["population"] == 4
    assert len(result["mean_accuracy_per_gen"]) == 2
    assert len(result["final_lrs"]) == 4
    assert json.load(open(result["history_path"]))  # history artifact exists


def test_every_config_preset_composes(tmp_path):
    """Every YAML in the render/sim/experiment groups must compose cleanly —
    guards preset files against drifting from the code's expectations."""
    from pathlib import Path

    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim.town import make_town_from_cfg
    from carla_imitation_learning_tpu.sim.world import SimParams

    cfg_root = (Path(__file__).resolve().parents[1]
                / "carla_imitation_learning_tpu" / "configs")
    for group, check in (
        ("render", lambda c: RenderConfig.from_cfg(c)),
        ("sim", lambda c: (SimParams.from_cfg(c),
                           make_town_from_cfg(c))),
        ("experiment", lambda c: c["experiment_name"]),
    ):
        for y in sorted((cfg_root / group).glob("*.yaml")):
            cfg = compose(overrides=[f"{group}={y.stem}",
                                     f"log_dir={tmp_path}",
                                     f"data_dir={tmp_path}/data"])
            check(cfg)  # raises on any stale/invalid preset


def test_cli_doctor_cpu(capsys):
    """Doctor runs every check green with CPU-pinned probes; device probes
    are subprocess-isolated so a wedged accelerator can't hang it."""
    rc = cli_main(["doctor", "--cpu", "--timeout", "300", "--json"])
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rc == 0 and out["ok"]
    for name in ("jax_import", "device_compute", "compile_smoke",
                 "virtual_cpu_mesh", "native_framestore", "configs"):
        assert out["checks"][name]["ok"], (name, out["checks"][name])
    assert out["checks"]["jax_import"]["platform"] == "cpu"
