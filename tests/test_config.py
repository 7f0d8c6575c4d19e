from carla_imitation_learning_tpu import compose


def test_compose_defaults():
    cfg = compose("config")
    # vae is the default model group (reference configs/config.yaml:5)
    assert cfg["BATCH_SIZE"] == 64
    assert cfg["camera"] == ["FL", "FR", "RR", "SL", "SR"]
    assert cfg["alpha"] == 0.75 and cfg["beta"] == 0.1
    assert cfg["image_size"] == [1, 224, 224]
    assert cfg["seed"] == 12345
    assert cfg["trainer"]["gradient_clip_val"] == 0.5


def test_compose_group_override():
    cfg = compose("config", overrides=["model=imitation"])
    assert cfg["obs_size"] == 4
    assert cfg["n_actions"] == 9
    assert cfg["frame_skip"] == 4
    assert cfg["camera"] == ["camera"]


def test_compose_value_overrides():
    cfg = compose("config", overrides=[
        "model=imitation", "BATCH_SIZE=8", "sim.n_envs=16",
        "train_logs=['LogX']", "trainer.max_epochs=3",
    ])
    assert cfg["BATCH_SIZE"] == 8
    assert cfg.sim.n_envs == 16
    assert cfg["train_logs"] == ["LogX"]
    assert cfg.trainer.max_epochs == 3


def test_now_interpolation():
    cfg = compose("config")
    assert "${now:" not in cfg["log_dir"]
    assert cfg["log_dir"].startswith("logs/")


def test_attribute_access_and_mutation():
    cfg = compose("config", overrides=["model=imitation"])
    cfg.camera = "semantic"  # reference mutates hparams imperatively (train.py:99)
    assert cfg["camera"] == "semantic"
    cfg["train_logs"] = ["Log1"]
    assert cfg.train_logs == ["Log1"]


def test_config_copy_preserves_nested_attribute_access():
    """Config.copy()/Config(plain_dict) must wrap nested dicts — dict's
    C-level init would bypass __setitem__ and break cfg.sim.town access."""
    from carla_imitation_learning_tpu.config import Config

    cfg = Config({"sim": {"town": {"blocks": 3}}})
    assert cfg.sim.town.blocks == 3
    c = cfg.copy()
    assert c.sim.town.blocks == 3
    c.set_dotted("sim.town.blocks", 5)
    assert c.sim.town.blocks == 5 and cfg.sim.town.blocks == 3  # deep copy
