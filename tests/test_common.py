import copy
import logging

import numpy as np
import pytest

from spider_tpu.common.config import Config, ConfigDict, apply_overrides
from spider_tpu.common.logger import MetricLogger, SmoothedValue
from spider_tpu.common.optims import build_schedule
from spider_tpu.common.registry import Registry
from spider_tpu.common import dist


def test_registry_roundtrip():
    reg = Registry()

    @reg.register_model("foo")
    class Foo:
        pass

    assert reg.get_model_class("foo") is Foo
    assert reg.get_model_class("bar") is None
    with pytest.raises(KeyError):

        @reg.register_model("foo")
        class Foo2:
            pass

    reg.register_path("cache", "/tmp/x")
    assert reg.get_path("cache") == "/tmp/x"
    assert reg.list_models() == ["foo"]


def test_configdict_attribute_access():
    cfg = ConfigDict({"model": {"type": "spider", "nested": {"a": 1}}, "lst": [{"b": 2}]})
    assert cfg.model.type == "spider"
    assert cfg.model.nested.a == 1
    assert cfg.lst[0].b == 2
    cfg.model.new = {"c": 3}
    assert cfg.model.new.c == 3
    d = cfg.to_dict()
    assert type(d["model"]) is dict
    c2 = copy.deepcopy(cfg)
    c2.model.type = "other"
    assert cfg.model.type == "spider"


def test_config_fromfile(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text("model = dict(type='spider', depth=2)\nrun = dict(max_epoch=1)\n")
    cfg = Config.fromfile(str(p))
    assert cfg.model.type == "spider"
    assert cfg.run.max_epoch == 1
    cfg = apply_overrides(cfg, ["run.max_epoch=5", "model.name=x"])
    assert cfg.run.max_epoch == 5
    assert cfg.model.name == "x"


def test_smoothed_value_and_metric_logger():
    sv = SmoothedValue(window_size=3)
    for v in [1, 2, 3, 4]:
        sv.update(v)
    assert sv.value == 4
    assert sv.avg == pytest.approx(3.0)
    assert sv.global_avg == pytest.approx(2.5)
    ml = MetricLogger()
    ml.update(loss=1.0, acc=np.float32(0.5))
    ml.update(loss=3.0)
    assert ml.loss.global_avg == pytest.approx(2.0)
    assert "loss" in str(ml)
    ml.synchronize_between_processes()  # single-process no-op
    out = list(ml.log_every(range(5), print_freq=2, header="t"))
    assert out == list(range(5))


def test_lr_schedules():
    import jax.numpy as jnp

    sched = build_schedule("linear_warmup_cosine_lr", init_lr=1e-3, min_lr=1e-5,
                           warmup_steps=10, total_steps=100)
    assert float(sched(0)) <= 1e-3 + 1e-9
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1e-5, rel=1e-2)
    sched2 = build_schedule("warmup_decay_lr", init_lr=1e-4, warmup_steps=500,
                            total_steps=250000)
    assert float(sched2(250)) == pytest.approx(5e-5, rel=1e-3)
    assert float(sched2(250000)) == pytest.approx(0.0, abs=1e-9)


def test_mesh_construction():
    import jax

    mesh = dist.make_mesh(data=2, fsdp=2, model=2)
    assert mesh.shape["data"] == 2
    assert mesh.shape["fsdp"] == 2
    assert mesh.shape["model"] == 2
    assert mesh.shape["expert"] == 1
    mesh2 = dist.make_mesh(data=None, model=4)
    assert mesh2.shape["data"] == 2
    assert mesh2.shape["model"] == 4
    full = dist.default_mesh()
    assert full.shape["data"] == len(jax.devices())
    with pytest.raises(ValueError):
        dist.make_mesh(data=3, model=3)


def test_config_merge_and_dump(tmp_path):
    cfg = Config.fromdict({"model": {"a": 1, "b": {"c": 2}}, "run": {"x": 1}})
    merged = cfg.merge({"model": {"b": {"c": 3, "d": 4}}})
    assert merged.model.a == 1
    assert merged.model.b.c == 3
    assert merged.model.b.d == 4
    out = tmp_path / "cfg.json"
    merged.dump(str(out))
    back = Config.fromfile(str(out))
    assert back.model.b.d == 4


def test_observability_tb_export_and_hbm_budget(tmp_path):
    import json

    from spider_tpu.common.observability import HbmBudget, export_tensorboard

    mpath = tmp_path / "metrics.jsonl"
    with open(mpath, "w") as f:
        for step in range(3):
            f.write(json.dumps({"step": step, "epoch": 0, "loss": 1.0 / (step + 1),
                                "lr": 1e-4}) + "\n")
    n = export_tensorboard(str(mpath), str(tmp_path / "tb"))
    assert n == 3
    assert any(p.name.startswith("events") for p in (tmp_path / "tb").iterdir())

    import jax.numpy as jnp

    budget = HbmBudget()
    budget.register("llm", {"w": jnp.zeros((2048, 2048), jnp.bfloat16)})
    out = budget.report()
    assert out["components_gb"]["llm"] > 0
    assert out["registered_total_gb"] > 0
