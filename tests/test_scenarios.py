"""Scenario evaluation suite (tiny shapes, CPU)."""

import json

import pytest

from carla_imitation_learning_tpu.cli import main as cli_main
from carla_imitation_learning_tpu.experiments import SCENARIOS, scenario_eval


def _overrides(tmp_path, extra=()):
    tiny = [
        "image_height=32", "image_width=32", "compute_dtype=float32",
        "sim.n_envs=2", "sim.n_agents=3", "render.height=32",
        "render.width=32", "render.max_triangles=256",
        "sim.town.blocks=2", "sim.town.n_buildings=6", "sim.n_lights=4",
        f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs",
    ]
    out = []
    for o in tiny + list(extra):
        out += ["-o", o]
    return out


def test_scenario_eval_cli(tmp_path, capsys):
    rc = cli_main(["run", "scenario_eval", "--json"] + _overrides(
        tmp_path, ["n_envs=2", "n_steps=8", "scenarios=clear,fog"]))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert set(result["summary"]) == {"clear", "fog"}
    for name in ("clear", "fog"):
        pol = result["scenarios"][name]["policy"]
        exp = result["scenarios"][name]["expert"]
        assert pol["env_steps"] == 16
        assert exp["action_agreement"] == 1.0
        assert 0.0 <= result["summary"][name]["policy"] <= 1.0
        # the expert drives under every condition
        assert exp["km_driven"] > 0
    assert 0.0 <= result["mean_driving_score"] <= 1.0


def test_scenario_eval_unknown_scenario(tiny_cfg):
    with pytest.raises(ValueError, match="unknown scenarios"):
        scenario_eval(tiny_cfg, scenarios="clear,warp_drive")


def test_every_scenario_builds(tiny_cfg):
    """Every registered scenario must produce a constructible world:
    town geometry + sim params + render config (catches delta-key typos —
    set_dotted would silently create dead keys)."""
    from carla_imitation_learning_tpu.experiments import _sim_bits

    cfg = tiny_cfg.copy()
    cfg.set_dotted("sim.town.blocks", 2)
    cfg.set_dotted("sim.town.n_buildings", 6)
    cfg.set_dotted("render.height", 32)
    cfg.set_dotted("render.width", 32)
    for name, delta in SCENARIOS.items():
        scfg = cfg.copy()
        for k, v in delta.items():
            assert k.split(".")[0] in ("sim", "render"), (name, k)
            scfg.set_dotted(k, v)
        town, params, rcfg = _sim_bits(scfg, backend="jax")
        assert rcfg.height == 32, name
        if "sim.n_pedestrians" in delta:
            assert params.n_pedestrians == delta["sim.n_pedestrians"], name
