"""Infrastructure tests: zoo, checkpoints, events, tensorboard adapter,
serialization round-trips, multi-runner fan-out."""
import dataclasses
import enum
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.events import Event, EpochEventArgs, LearningRateStopWatchdog, StopTraining
from awesome_tpu.fit.checkpoint import (
    AgentCheckpoint,
    load_prior_cache,
    save_prior_cache,
)
from awesome_tpu.fit.tracker import Tracker
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.zoo import Zoo
from awesome_tpu.runner.config import AwesomeConfig
from awesome_tpu.runner.multi import (
    GridSearchRunner,
    MultiConfigRunner,
    expand_grid,
    shard_jobs,
)
from awesome_tpu.serialization.jsonconv import (
    from_jsonable,
    load_yaml,
    save_yaml,
    to_jsonable,
)
from awesome_tpu.utils.format import numerated_file_name, snake_case, strfdelta
from awesome_tpu.utils.tensorboard import Tensorboard


def test_zoo_roundtrip(tmp_path):
    model = ConvexNextNet(n_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    zoo = Zoo(str(tmp_path / "zoo"))
    key = zoo.save_model_state("flow_identity", model, params,
                               config={"lr": 0.01}, context={"loss": 0.5})
    loaded, ctx = zoo.load_model_state("flow_identity", model, params,
                                       config={"lr": 0.01})
    assert loaded is not None and ctx["loss"] == 0.5
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different config -> cache miss
    miss, _ = zoo.load_model_state("flow_identity", model, params,
                                   config={"lr": 0.02})
    assert miss is None


def test_agent_checkpoint_roundtrip(tmp_path):
    model = ConvexNextNet(n_hidden=8)
    params = model.init(jax.random.PRNGKey(1))
    t = Tracker()
    t.epoch_metric("Loss", 0.5, "val")
    ckpt = AgentCheckpoint("agent", params, tracker=t.to_dict(),
                           config={"num_epochs": 10})
    d = ckpt.save(str(tmp_path / "ckpt"))
    loaded = AgentCheckpoint.load(d, params_template=params)
    assert loaded.name == "agent"
    assert loaded.config["num_epochs"] == 10
    t2 = Tracker.from_dict(loaded.tracker)
    assert t2.series[("Loss", "epoch", "val")].last == 0.5
    for a, b in zip(jax.tree_util.tree_leaves(loaded.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_agent_checkpoint_namedtuple_opt_state_roundtrip(tmp_path):
    """Optimizer states are NamedTuples; Orbax restores those as plain
    dicts, so the template-driven load must rebuild the exact structure
    (field-name path matching — JointTrainState's field order differs
    from its sorted key order, which a naive leaf-order unflatten would
    silently mis-assign)."""
    from awesome_tpu.fit import optim

    model = ConvexNextNet(n_hidden=8)
    params = model.init(jax.random.PRNGKey(1))
    opt = optim.adam_init(params)
    ckpt = AgentCheckpoint("agent", params, opt_state=opt)
    d = ckpt.save(str(tmp_path / "ckpt"))
    loaded = AgentCheckpoint.load(d, params_template=params,
                                  opt_template=opt)
    assert type(loaded.opt_state).__name__ == "AdamState"
    assert (jax.tree_util.tree_structure(loaded.opt_state)
            == jax.tree_util.tree_structure(opt))
    for a, b in zip(jax.tree_util.tree_leaves(loaded.opt_state),
                    jax.tree_util.tree_leaves(opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prior_cache_checkpoint(tmp_path):
    model = ConvexNextNet(n_hidden=8)
    stacked = jax.vmap(model.init)(jax.random.split(jax.random.PRNGKey(0), 4))
    path = str(tmp_path / "prior_cache")
    save_prior_cache(stacked, path)
    loaded = load_prior_cache(path, template=stacked)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(stacked)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_event_attach_notify_cancel():
    ev = Event("test")
    calls = []
    ev.attach(lambda s, a: calls.append(1))

    @ev.attach
    def canceler(s, a):
        a.cancel = True
        calls.append(2)

    ev.attach(lambda s, a: calls.append(3))
    ev.notify(None, EpochEventArgs())
    assert calls == [1, 2]
    ev.muted = True
    ev.notify(None, EpochEventArgs())
    assert calls == [1, 2]


def test_lr_watchdog_raises():
    wd = LearningRateStopWatchdog(threshold_scale=0.01)
    args = EpochEventArgs(metrics={"lr_scale": 0.005})
    with pytest.raises(StopTraining):
        wd(None, args)
    wd(None, EpochEventArgs(metrics={"lr_scale": 0.5}))  # no raise


def test_tensorboard_adapter(tmp_path):
    tb = Tensorboard(str(tmp_path / "tb"))
    tb.log_metric_entry("MIOU", 0.9, step=1, mode="eval")
    tb.log_image("mask", np.zeros((8, 8, 3), np.float32), step=0)
    tb.log_config_markdown(AwesomeConfig(num_epochs=5))
    t = Tracker()
    t.epoch_metric("Loss", 0.1)
    tb.attach_to_tracker(t)
    tb.close()
    assert os.listdir(tmp_path / "tb")


class _Color(enum.Enum):
    RED = 1


def test_serialization_rules_roundtrip(tmp_path):
    value = {
        "tuple": (1, 2.5, "x"),
        "set": {1, 2},
        "slice": slice(1, 10, 2),
        "enum": _Color.RED,
        "array": np.arange(6).reshape(2, 3).astype(np.float32),
        "type": ConvexNextNet,
        "nested": [{"a": (1,)}],
    }
    j = to_jsonable(value)
    back = from_jsonable(j)
    assert back["tuple"] == (1, 2.5, "x")
    assert back["set"] == {1, 2}
    assert back["slice"] == slice(1, 10, 2)
    assert back["enum"] is _Color.RED
    np.testing.assert_array_equal(back["array"], value["array"])
    assert back["type"] is ConvexNextNet
    assert back["nested"][0]["a"] == (1,)
    # yaml file roundtrip
    path = str(tmp_path / "v.yaml")
    save_yaml(value, path)
    back2 = load_yaml(path)
    assert back2["enum"] is _Color.RED


def test_grid_search_runner(tmp_path):
    base = AwesomeConfig(name_experiment="base", num_epochs=10)
    grid = {"num_epochs": [5, 10], "optimizer_args.lr": [0.1, 0.2]}
    assert len(expand_grid(grid)) == 4
    runner = GridSearchRunner(base, grid, output_dir=str(tmp_path))
    children = runner.build()
    assert len(children) == 4
    assert children[0].diff_config
    assert {c.optimizer_args["lr"] for c in children} == {0.1, 0.2}
    job_file = runner.create_job_file()
    assert os.path.exists(job_file)
    ns = {}
    exec(open(job_file).read(), ns)
    assert len(ns["JOBS"]) == 4
    # sharding covers all jobs exactly once
    all_jobs = runner.create_jobs()
    sharded = [j for s in range(3) for j in shard_jobs(all_jobs, 3, s)]
    assert len(sharded) == len(all_jobs)


def test_multi_config_runner(tmp_path):
    for i in range(3):
        save_yaml(AwesomeConfig(num_epochs=i + 1),
                  str(tmp_path / f"c{i}.yaml"))
    mc = MultiConfigRunner(str(tmp_path))
    assert len(mc.scan()) == 3
    assert len(mc.create_jobs()) == 3


def test_format_helpers(tmp_path):
    assert strfdelta(3661) == "01:01:01"
    assert snake_case("ConvexNextNet") == "convex_next_net"
    p = str(tmp_path / "f.txt")
    assert numerated_file_name(p) == p
    open(p, "w").close()
    assert numerated_file_name(p).endswith("f_1.txt")


def test_latex_postprocessor():
    from awesome_tpu.utils.format import latex_postprocessor

    raw = ("\\toprule\nmodel_name & \\bfseries 0.906 & "
           "\\text-decorationunderline 0.871 \\\\\n\\bottomrule")
    out = latex_postprocessor(raw)
    assert "model\\_name" in out
    assert "\\textbf{0.906}" in out
    assert "\\underline{0.871}" in out
    assert "rule" not in out and out.count("\\hline") == 2
    # already-escaped underscores are not double-escaped
    assert latex_postprocessor("a\\_b") == "a\\_b"
    # styled token directly before the row terminator (no padding space)
    out2 = latex_postprocessor("a & \\bfseries 0.906\\\\")
    assert out2 == "a & \\textbf{0.906}\\\\"
    # ...and at end of string
    assert latex_postprocessor("\\bfseries last") == "\\textbf{last}"


def test_serialization_function_rule_roundtrips():
    """Module-level functions serialize by dotted reference.
    Spec: `awesome/serialization/rules` function rule."""
    from awesome_tpu.serialization.jsonconv import from_jsonable, to_jsonable
    from awesome_tpu.measures.losses import bce

    data = to_jsonable({"criterion": bce})
    restored = from_jsonable(data)
    assert restored["criterion"] is bce


def test_serialization_pickle_fallback_roundtrips():
    """Types with no rule fall back to base64 pickle (reference pickle
    rule) instead of raising."""
    from awesome_tpu.serialization.jsonconv import from_jsonable, to_jsonable

    value = {"rng_state": bytes(range(8)), "c": complex(1, 2)}
    data = to_jsonable(value)
    restored = from_jsonable(data)
    assert restored["rng_state"] == value["rng_state"]
    assert restored["c"] == value["c"]
