"""Tests for the hydra-compatible config loader."""
import textwrap
from pathlib import Path

import pytest

from afford_motion_tpu.utils.config import DictConfig, load_config


@pytest.fixture
def config_dir(tmp_path: Path) -> Path:
    (tmp_path / "task").mkdir()
    (tmp_path / "model").mkdir()
    (tmp_path / "default.yaml").write_text(textwrap.dedent("""
        hydra:
          run:
            dir: ${exp_dir}
        defaults:
          - _self_
          - task: null
          - model: null
        output_dir: outputs
        exp_name: default
        exp_dir: ${output_dir}/${now:%Y}_${exp_name}
        seed: 2023
        diffusion:
          steps: 1000
          noise_schedule: cosine
    """))
    (tmp_path / "task" / "contact_gen.yaml").write_text(textwrap.dedent("""
        name: contact
        train:
          lr: 1e-4
          batch_size: 32
        dataset:
          num_points: 8192
          sigma: 0.5
    """))
    (tmp_path / "model" / "cdm.yaml").write_text(textwrap.dedent("""
        name: CDM
        input_feats: -1
        scene_model:
          num_points: ${task.dataset.num_points}
    """))
    return tmp_path


def test_group_composition_and_interpolation(config_dir):
    cfg = load_config(config_dir, ["task=contact_gen", "model=cdm"])
    assert cfg.task.train.batch_size == 32
    assert cfg.model.name == "CDM"
    # cross-group interpolation
    assert cfg.model.scene_model.num_points == 8192
    # now: resolver + nested string interpolation
    assert cfg.exp_dir.startswith("outputs/2") and cfg.exp_dir.endswith("_default")
    assert "hydra" not in cfg


def test_dotted_overrides(config_dir):
    cfg = load_config(config_dir, [
        "task=contact_gen", "model=cdm",
        "task.train.batch_size=64", "task.train.lr=2e-4",
        "exp_name=myexp", "diffusion.steps=500",
        "+task.train.extra_flag=true",
    ])
    assert cfg.task.train.batch_size == 64
    assert cfg.task.train.lr == 2e-4
    assert cfg.diffusion.steps == 500
    assert cfg.exp_dir.endswith("_myexp")
    assert cfg.task.train.extra_flag is True


def test_missing_group_stays_absent(config_dir):
    cfg = load_config(config_dir, [])
    assert "task" not in cfg


def test_dictconfig_access():
    c = DictConfig({"a": {"b": [1, {"c": 2}]}})
    assert c.a.b[1].c == 2
    c.a.d = {"e": 5}
    assert c.a.d.e == 5
    assert c.to_dict() == {"a": {"b": [1, {"c": 2}], "d": {"e": 5}}}


def test_lazy_interpolation_of_dangling_refs(tmp_path):
    """OmegaConf-style laziness: a reference into a group key that the
    selected task doesn't define must not fail at load (the published t2m
    configs rely on this for model.scene_model.use_color)."""
    import textwrap
    (tmp_path / "task").mkdir()
    (tmp_path / "model").mkdir()
    (tmp_path / "default.yaml").write_text(textwrap.dedent("""
        defaults:
          - _self_
          - task: null
          - model: null
        seed: 1
    """))
    (tmp_path / "task" / "t.yaml").write_text("dataset:\n  num_points: 64\n")
    (tmp_path / "model" / "m.yaml").write_text(textwrap.dedent("""
        name: CDM
        scene_model:
          use_color: ${task.dataset.use_color}
          num_points: ${task.dataset.num_points}
    """))
    cfg = load_config(tmp_path, ["task=t", "model=m"])
    assert cfg.model.scene_model.num_points == 64
    # dangling ref stays as the raw string instead of raising
    assert cfg.model.scene_model.use_color == "${task.dataset.use_color}"
