import os

import numpy as np
import pytest

from spider_tpu import register_all
from spider_tpu.common.config import Config
from spider_tpu.common.registry import registry


@pytest.fixture(scope="module")
def cfg():
    register_all()
    import spider_tpu.runners.runner  # noqa: F401

    return Config.fromfile(os.path.join(os.path.dirname(__file__), "..",
                                        "train_configs", "spider_demo_train.py"))


@pytest.mark.slow
def test_task_builds_model_and_datasets(cfg):
    from spider_tpu import tasks

    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    assert "train" in datasets
    assert set(datasets["train"]) == {"t2i_cc_sbu", "i2t_cc_sbu", "t2a_audiocap"}
    model = task.build_model(cfg)
    assert model.model_name == "spider"


@pytest.mark.slow
def test_runner_trains_and_checkpoints(cfg, tmp_path):
    from spider_tpu import tasks

    cfg = Config.fromdict(cfg.to_dict())
    cfg.run.output_dir = str(tmp_path / "out")
    cfg.run.iters_per_epoch = 2
    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)
    runner_cls = registry.get_runner_class("runner_base")
    runner = runner_cls(cfg=cfg, task=task, model=model, datasets=datasets,
                        job_id="test")
    stats = runner.train()
    assert "loss" in stats
    assert runner.global_step == 2
    ckpt = runner._ckpt_dir(0)
    assert os.path.exists(ckpt)

    # resume restores step/epoch
    runner2 = runner_cls(cfg=cfg, task=task, model=model, datasets=datasets,
                         job_id="test2")
    runner2.load_checkpoint(ckpt)
    assert runner2.global_step == 2
    assert runner2.start_epoch == 1
    # restored params match
    import jax

    flat1 = np.asarray(jax.tree_util.tree_leaves(runner.params)[0])
    flat2 = np.asarray(jax.tree_util.tree_leaves(runner2.params)[0])
    np.testing.assert_allclose(flat1, flat2)


@pytest.mark.slow
def test_runner_eval_split(cfg, tmp_path):
    from spider_tpu import tasks

    cfg2 = Config.fromdict(cfg.to_dict())
    cfg2.run.output_dir = str(tmp_path / "out")
    cfg2.run.iters_per_epoch = 1
    cfg2.datasets["i2t_cc_sbu"]["split"] = "val"
    task = tasks.setup_task(cfg2)
    datasets = task.build_datasets(cfg2)
    assert set(datasets) == {"train", "val"}
    model = task.build_model(cfg2)
    runner_cls = registry.get_runner_class("runner_base")
    runner = runner_cls(cfg=cfg2, task=task, model=model, datasets=datasets,
                        job_id="test_eval")
    results = runner.eval_epoch("val", max_batches=1)
    assert results and "loss" in results[0]
    assert np.isfinite(results[0]["loss"])


@pytest.mark.slow
def test_runner_context_parallel(tmp_path):
    """spider_longctx_train.py: Spider trains with the LLM's ring
    attention over a context=4 mesh axis (runner wires
    with_context_parallel from run.mesh)."""
    from spider_tpu import tasks

    register_all()
    import spider_tpu.runners.runner  # noqa: F401

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(__file__), "..", "train_configs",
        "spider_longctx_train.py"))
    cfg.run.output_dir = str(tmp_path / "out")
    cfg.run.iters_per_epoch = 1
    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)
    runner_cls = registry.get_runner_class("runner_base")
    runner = runner_cls(cfg=cfg, task=task, model=model, datasets=datasets,
                        job_id="cp_test")
    assert model.llm.config.context_mesh is not None   # CP actually wired
    stats = runner.train()
    assert np.isfinite(float(stats["loss"]))
