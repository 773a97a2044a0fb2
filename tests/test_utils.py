import textwrap

import pytest

from macvo_tpu.utils.config import build_dynamic_config, load_config, namespace_to_dict
from macvo_tpu.utils.registry import Registered, RegisteredConfigTestable
from macvo_tpu.utils.sandbox import Sandbox


class IThing(Registered, register=False):
    pass


class AThing(IThing):
    def __init__(self, value=1):
        self.value = value


class BThing(IThing):
    pass


def test_registry_lookup():
    assert set(IThing.registered()) == {"AThing", "BThing"}
    obj = IThing.instantiate("AThing", value=7)
    assert isinstance(obj, AThing) and obj.value == 7
    with pytest.raises(KeyError):
        IThing.get_class("Nope")


def test_registry_namespaces_isolated():
    class IOther(Registered, register=False):
        pass

    class COther(IOther):
        pass

    assert "COther" not in IThing.registered()
    assert set(IOther.registered()) == {"COther"}


class IValidated(RegisteredConfigTestable, register=False):
    pass


class GoodImpl(IValidated):
    @classmethod
    def is_valid_config(cls, config):
        cls._enforce_config_spec(config, {"k": lambda v: isinstance(v, int) and v > 0})


def test_config_validation():
    cfg, _ = build_dynamic_config({"type": "GoodImpl", "args": {"k": 5}})
    IValidated.is_valid_config(cfg)
    bad, _ = build_dynamic_config({"type": "GoodImpl", "args": {"k": -1}})
    with pytest.raises(ValueError):
        IValidated.is_valid_config(bad)
    missing, _ = build_dynamic_config({"type": "GoodImpl", "args": {}})
    with pytest.raises(ValueError):
        IValidated.is_valid_config(missing)


def test_yaml_include_and_flatten(tmp_path):
    (tmp_path / "inner.yaml").write_text("shared: 42\n")
    (tmp_path / "outer.yaml").write_text(
        textwrap.dedent(
            """
            name: test
            child: !include inner.yaml
            items: !flatten_seq [[1, 2], [3], 4]
            """
        )
    )
    ns, raw = load_config(tmp_path / "outer.yaml")
    assert ns.child.shared == 42
    assert ns.items == [1, 2, 3, 4]
    assert namespace_to_dict(ns) == raw


def test_sandbox(tmp_path):
    box = Sandbox.create(tmp_path, "proj")
    assert (box.folder / "metadata.yaml").exists()
    ns, _ = build_dynamic_config({"a": 1})
    box.config = ns
    reloaded = Sandbox.load(box.folder)
    assert reloaded.config.a == 1
    child = box.new_child("sub")
    assert child.folder.exists()
    assert [c.folder for c in box.get_children()] == [child.folder]
    assert "config.yaml" in box
