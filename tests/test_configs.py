"""Config-suite validation (mirrors reference CI tests
Scripts/UnitTest/test_config_loadable.py + test_config_macvo.py): every
shipped yaml must parse (incl. !include) and every odometry config must pass
the full registry/spec validation without loading any weights."""

from pathlib import Path

import pytest

from macvo_tpu.odometry import MACVO
from macvo_tpu.utils.config import load_config

CONFIG_ROOT = Path(__file__).parent.parent / "configs"
ALL_CONFIGS = sorted(CONFIG_ROOT.rglob("*.yaml"))
ODOM_CONFIGS = sorted((CONFIG_ROOT / "experiment" / "macvo").rglob("*.yaml"))


def test_configs_exist():
    assert len(ALL_CONFIGS) >= 15
    assert len(ODOM_CONFIGS) >= 13


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: str(p.relative_to(CONFIG_ROOT)))
def test_config_loadable(path):
    ns, raw = load_config(path)
    assert raw


@pytest.mark.parametrize("path", ODOM_CONFIGS, ids=lambda p: p.stem)
def test_config_macvo_valid(path):
    cfg, _ = load_config(path)
    MACVO.is_valid_config(cfg.Odometry)


def test_bad_registry_name_raises():
    from macvo_tpu.modules import IKeypointSelector

    with pytest.raises(KeyError, match="NotARealSelector"):
        IKeypointSelector.get_class("NotARealSelector")
